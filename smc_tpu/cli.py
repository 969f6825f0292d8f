"""Command-line interface.

Replaces the reference's argument-less entry scripts (config edited in
source, SURVEY.md §5 'no CLI flags, no env vars') with a real CLI:

  smc-tpu run --model mm --particles 1000                # inference run
  smc-tpu run --model methanation --particles 512
  smc-tpu run --model banana --device-loop
  smc-tpu ensemble --datasets 8 --particles 512          # hierarchical
  smc-tpu sbc --replicates 64                            # calibration check
  smc-tpu generate-data --outdir data                    # C16 pseudo-data
  smc-tpu resume --checkpoint runs/<ts>/checkpoints/step3.npz --model mm
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _add_common(p):
    p.add_argument("--particles", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--outdir", default="runs")
    p.add_argument("--max-steps", type=int, default=50)
    p.add_argument("--mh-steps", type=int, default=5)
    p.add_argument("--mh-steps-final", type=int, default=20)
    p.add_argument("--ess-limit", type=float, default=0.5)
    p.add_argument("--no-plots", action="store_true")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the particle axis over this many devices "
                        "(0 = single device)")
    p.add_argument("--resampling", default="residual_systematic",
                   choices=["residual_systematic", "ring", "systematic",
                            "stratified", "multinomial"],
                   help="resampling scheme; 'ring' = residual-systematic "
                        "with O(N/S)-per-chip ring-exchange redistribution "
                        "on sharded runs (bitwise-identical results)")
    p.add_argument("--mutation", default="rwm",
                   choices=["rwm", "mala", "hmc"],
                   help="mutation kernel: the reference's adaptive RW-"
                        "Metropolis, preconditioned MALA, or precondi"
                        "tioned HMC (gradient moves through the differen"
                        "tiable simulator; not available with the opaque "
                        "pallas likelihoods)")
    p.add_argument("--hmc-leapfrog", type=int, default=5,
                   help="leapfrog steps per HMC proposal")
    p.add_argument("--device-loop", action="store_true",
                   help="fuse the whole run into one XLA program "
                        "(no per-step artifacts)")
    p.add_argument("--granularity", default="step",
                   choices=["step", "sweep", "block"],
                   help="device-execution granularity: 'step' fuses all "
                        "of a step's MH sweeps into one XLA execution "
                        "(fastest); 'sweep' bounds each execution to one "
                        "sweep (required at huge N on tunneled "
                        "single-chip sessions, where multi-minute "
                        "executions crash the TPU worker); 'block' "
                        "additionally splits each sweep into "
                        "particles/block-particles executions (N >= ~1e6 "
                        "methanation, where even one sweep is too long)")
    p.add_argument("--block-particles", type=int, default=None,
                   help="particles per device execution with "
                        "--granularity block (must divide --particles)")
    p.add_argument("--checkpoint-format", default="auto",
                   choices=["auto", "npz", "smck", "smcd"],
                   help="checkpoint container: 'auto' = native async .smck "
                        "if built else .npz; 'smcd' streams row slabs to a "
                        "memory-mapped per-field directory (O(slab) host "
                        "memory — for states too large to gather to host "
                        "RAM in one piece)")
    p.add_argument("--profile", default=None, metavar="LOGDIR",
                   help="capture a jax.profiler device trace to LOGDIR")
    p.add_argument("--max-restarts", type=int, default=0,
                   help="stall/crash resilience: checkpoint every step to "
                        "checkpoints/latest and, on a device/runtime "
                        "failure, reload it and continue; at most this "
                        "many consecutive no-progress failures are "
                        "retried (0 = off)")
    p.add_argument("--stop-file", default=None, metavar="PATH",
                   help="cooperative preemption: poll PATH between device "
                        "executions and, when it appears, finalize cleanly "
                        "with the last completed step (artifacts + "
                        "checkpoint written; resume later with 'smc-tpu "
                        "resume'). The safe way to stop a long detached "
                        "run — killing the process mid-execution can wedge "
                        "the device")


def _build_model(args):
    from smc_tpu.models.michaelis_menten import (
        MichaelisMentenModel, MM_TRUE_VMAX, MM_TRUE_KM, MM_TRUE_NOISE)
    if args.model == "mm":
        if (getattr(args, "mutation", "rwm") in ("mala", "hmc")
                and args.mm_method.startswith("pallas")):
            raise SystemExit(f"--mutation {args.mutation} needs a "
                             "differentiable likelihood; use --mm-method "
                             "exact/rk4/dopri5")
        m = MichaelisMentenModel.default(method=args.mm_method)
        return m, [MM_TRUE_VMAX, MM_TRUE_KM, MM_TRUE_NOISE]
    if args.model == "methanation":
        import os
        from smc_tpu.models.methanation import (MethanationModel, KIN_TRUE,
                                                SIGMA_TRUE)
        datalist = None
        if getattr(args, "datalist", None):
            datalist = tuple(int(s) for s in args.datalist.split(","))
        nx_kw = {}
        if getattr(args, "nx", None):
            nx_kw["nx"] = args.nx
        if getattr(args, "information_csv", None):
            m = MethanationModel.from_reference_csv(
                args.information_csv, datalist=datalist,
                particle_chunk=args.chunk, **nx_kw)
        elif getattr(args, "data_dir", None):
            m = MethanationModel.from_csv(
                os.path.join(args.data_dir, "conditions.csv"),
                os.path.join(args.data_dir, "data.csv"),
                datalist=datalist, particle_chunk=args.chunk, **nx_kw)
        else:
            m = MethanationModel.default(n_conditions=args.conditions,
                                         datalist=datalist,
                                         particle_chunk=args.chunk, **nx_kw)
        if getattr(args, "march", None):
            import dataclasses
            m = dataclasses.replace(m, march=args.march)
        truth = list(KIN_TRUE) + [SIGMA_TRUE]
        return m, [truth[i] for i in m.est_idx]
    if args.model == "lv":
        from smc_tpu.models.generic import (LV_TRUE, LV_TRUE_NOISE,
                                            lotka_volterra_model)
        return lotka_volterra_model(), list(LV_TRUE) + [LV_TRUE_NOISE]
    if args.model in ("robertson", "robertson-dae"):
        from smc_tpu.models.generic import (ROBERTSON_TRUE,
                                            ROBERTSON_TRUE_NOISE,
                                            robertson_model)
        form = "dae" if args.model.endswith("dae") else "ode"
        return (robertson_model(form=form),
                list(ROBERTSON_TRUE) + [ROBERTSON_TRUE_NOISE])
    if args.model == "banana":
        from smc_tpu.models.synthetic import BananaModel
        return BananaModel(), None
    if args.model == "gmm":
        from smc_tpu.models.synthetic import GaussianMixtureModel
        return GaussianMixtureModel.default(), None
    raise SystemExit(f"unknown model {args.model!r}")


def _cfg(args):
    from smc_tpu.config import SMCConfig
    return SMCConfig(n_particles=args.particles, max_steps=args.max_steps,
                     mh_steps=args.mh_steps,
                     mh_steps_final=args.mh_steps_final,
                     ess_limit=args.ess_limit,
                     resampling=getattr(args, "resampling",
                                        "residual_systematic"),
                     mutation=getattr(args, "mutation", "rwm"),
                     hmc_leapfrog=getattr(args, "hmc_leapfrog", 5),
                     block_particles=getattr(args, "block_particles", None))


def cmd_run(args):
    import jax
    from smc_tpu.io.rundir import RunDir
    from smc_tpu.runner import run_with_artifacts
    from smc_tpu.utils.metrics import profile_trace
    model, truth = _build_model(args)
    cfg = _cfg(args)
    key = jax.random.key(args.seed)
    prof = profile_trace(getattr(args, "profile", None))
    with prof:
        return _run_inner(args, model, truth, cfg, key)


def _run_inner(args, model, truth, cfg, key):
    import jax
    import numpy as np  # noqa: F811
    from smc_tpu.io.rundir import RunDir
    from smc_tpu.runner import run_with_artifacts

    if args.device_loop or args.mesh:
        from smc_tpu.smc.driver import run_smc_on_device, run_smc, init_state
        state, psh = None, None
        if args.mesh:
            from smc_tpu.parallel.mesh import (make_mesh, shard_state,
                                               particle_sharding)
            mesh = make_mesh(args.mesh)
            state = shard_state(init_state(key, model, cfg), mesh)
            psh = particle_sharding(mesh)
        if args.device_loop:
            final = run_smc_on_device(model, cfg, key, state=state,
                                      psharding=psh)
        else:
            final = run_smc(model, cfg, key, state=state, psharding=psh,
                            verbose=not args.quiet,
                            granularity=args.granularity,
                            stop_file=getattr(args, "stop_file", None))
        p = np.asarray(final.particles)
        rd = RunDir(root=args.outdir, tag=args.model)
        from smc_tpu.io.csvio import save_posterior_csv
        save_posterior_csv(rd.file("Posterior_Distribution.csv"), p,
                           model.param_names)
    else:
        final, rd = run_with_artifacts(
            model, cfg, key, rundir=RunDir(root=args.outdir, tag=args.model),
            true_values=truth, plots_enabled=not args.no_plots,
            verbose=not args.quiet,
            granularity=getattr(args, "granularity", "step"),
            checkpoint_format=getattr(args, "checkpoint_format", "auto"),
            max_restarts=getattr(args, "max_restarts", 0),
            stop_file=getattr(args, "stop_file", None))
        p = np.asarray(final.particles)

    print(f"gamma: {float(final.gamma)}  steps: {int(final.step)}  "
          f"log evidence: {float(final.log_evidence):.4f}")
    for i, nm in enumerate(model.param_names or
                           [f"p{i}" for i in range(p.shape[1])]):
        print(f"  {nm}: mean={p[:, i].mean():.6g} std={p[:, i].std():.4g}")
    print(f"artifacts: {rd.path}")
    return 0


def cmd_resume(args):
    import jax
    from smc_tpu.io.rundir import RunDir
    from smc_tpu.runner import run_with_artifacts
    model, truth = _build_model(args)
    cfg = _cfg(args)
    mesh = None
    if args.mesh:
        from smc_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh)
    final, rd = run_with_artifacts(
        model, cfg, jax.random.key(args.seed),
        rundir=RunDir(root=args.outdir, tag=f"{args.model}_resume"),
        true_values=truth, resume_from=args.checkpoint,
        plots_enabled=not args.no_plots, verbose=not args.quiet, mesh=mesh,
        granularity=getattr(args, "granularity", "step"),
        checkpoint_format=getattr(args, "checkpoint_format", "auto"))
    print(f"gamma: {float(final.gamma)}  steps: {int(final.step)}")
    print(f"artifacts: {rd.path}")
    return 0


def cmd_map(args):
    import jax
    from smc_tpu.opt import map_estimate
    from smc_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    model, truth = _build_model(args)
    res = map_estimate(model, jax.random.key(args.seed),
                       n_starts=args.starts, steps=args.steps, lr=args.lr)
    names = getattr(model, "param_names", None) or [
        f"p{i}" for i in range(res.theta.shape[0])]
    print(f"log posterior (unnormalized): {float(res.log_post):.4f}  "
          f"({args.starts} starts, {args.steps} Adam steps)")
    import numpy as np
    th = np.asarray(res.theta)
    for i, nm in enumerate(names[:th.shape[0]]):
        line = f"  {nm}: {th[i]:.6g}"
        if truth is not None:
            line += f"   (true {truth[i]:.6g})"
        print(line)
    return 0


def cmd_ensemble(args):
    import jax
    import jax.numpy as jnp
    from smc_tpu.models.michaelis_menten import (generate_mm_pseudo_data,
                                                 make_mm_data_loglik)
    from smc_tpu.priors import Prior
    from smc_tpu.smc.ensemble import run_ensemble_on_device
    ts, obs0, s0 = generate_mm_pseudo_data()
    keys = jax.random.split(jax.random.key(args.seed + 1), args.datasets)
    obs = jnp.stack([jnp.asarray(obs0) + 0.02 * jax.random.normal(k, obs0.shape)
                     for k in keys])
    loglik = make_mm_data_loglik(jnp.asarray(ts), jnp.asarray(s0),
                                 method=getattr(args, "method", "exact"))
    prior = Prior.uniform([0.0, 0.0, 0.0], [10.0, 10.0, 10.0])
    states = run_ensemble_on_device(jax.random.key(args.seed), prior, loglik,
                                    obs, args.datasets, _cfg(args))
    p = np.asarray(states.particles)
    for d in range(args.datasets):
        print(f"dataset {d}: gamma={float(states.gamma[d]):.3f} "
              f"steps={int(states.step[d])} "
              f"logZ={float(states.log_evidence[d]):.3f} "
              f"mean={np.round(p[d].mean(0), 4).tolist()}")
    return 0


def cmd_sbc(args):
    """Simulation-based calibration of the sampler (Talts et al. 2018):
    R replicate prior-draw -> simulate -> posterior cycles, run as ONE
    fused ensemble program, then rank-uniformity statistics. The
    statistical upgrade of the reference's truth-vline-on-histogram check
    (methanation_functions.py:194); see docs/PARITY.md."""
    import jax
    from smc_tpu.config import SMCConfig
    from smc_tpu.smc.sbc import (methanation_sbc_problem, mm_sbc_problem,
                                 rank_chi2, rank_chi2_pvalues, sbc_ranks)
    if args.model == "mm":
        prior, simulate, loglik, names = mm_sbc_problem()
    else:
        full = getattr(args, "est", "af-sigma") == "full"
        from smc_tpu.models.methanation import EST_DEFAULT
        prior, simulate, loglik, names = methanation_sbc_problem(
            n_conditions=getattr(args, "conditions", 2),
            nx=getattr(args, "nx", 11),
            n_steps=None if full else 6, growth=None if full else 1.6,
            particle_chunk=min(getattr(args, "chunk", 64), args.particles),
            est_idx=EST_DEFAULT if full else (0, 8),
            reference_prior=full)
    if args.rank_draws >= args.particles:
        raise SystemExit("--rank-draws must be < --particles")
    cfg = SMCConfig(n_particles=args.particles, mh_steps=args.mh_steps,
                    mh_steps_final=args.mh_steps_final)
    ranks, _, _ = sbc_ranks(jax.random.key(args.seed), prior, simulate,
                            loglik, n_replicates=args.replicates, cfg=cfg,
                            n_rank_draws=args.rank_draws,
                            granularity=getattr(args, "granularity",
                                                "fused"),
                            verbose=not getattr(args, "quiet", False))
    R, L = args.replicates, args.rank_draws
    stats = rank_chi2(ranks, L)
    pvals = rank_chi2_pvalues(ranks, L)
    # mean normalized rank: calibrated -> 0.5 +/- 1/sqrt(12 R); readable
    # even at replicate counts too small for the chi-square bins.
    mean_norm = ranks.mean(0) / L
    z = (mean_norm - 0.5) * np.sqrt(12.0 * R)
    print(f"SBC: {R} replicates x {args.particles} particles, "
          f"{L} rank draws ({args.model})")
    for j, nm in enumerate(names):
        print(f"  {nm}: mean rank {mean_norm[j]:.3f} (z={z[j]:+.2f})  "
              f"chi2(df7)={stats[j]:.2f}  p={pvals[j]:.3g}")
    calibrated = bool((pvals > args.alpha).all())
    if R < 40:
        zmax = getattr(args, "z_max", 4.0)
        print(f"  (chi-square is underpowered below ~40 replicates; "
              f"exit code uses the mean-rank |z| < {zmax} rule — "
              f"see --z-max; --alpha has no effect here)")
        calibrated = bool((np.abs(z) < zmax).all())
    print(f"calibrated: {calibrated}")
    if args.ranks_csv:
        with open(args.ranks_csv, "w") as f:
            f.write(",".join(names) + "\n")
            for row in ranks:
                f.write(",".join(str(int(v)) for v in row) + "\n")
        print(f"wrote {args.ranks_csv}")
    return 0 if calibrated else 1


def cmd_generate_data(args):
    """C16/C17 parity: MM pseudo-data CSVs (Micmen_generate_data.py:31-66)
    or methanation data.csv/data_mol.csv/conditions.csv
    (SMC_methanation_main.py:86-107)."""
    import os
    import jax
    from smc_tpu.models.michaelis_menten import (generate_mm_pseudo_data,
                                                 MM_S0_LIST)
    os.makedirs(args.outdir, exist_ok=True)
    if getattr(args, "model", "mm") == "methanation":
        import jax.numpy as jnp
        from smc_tpu.models.methanation import MethanationModel, KIN_TRUE
        m = MethanationModel.default(n_conditions=args.conditions,
                                     key=jax.random.key(args.seed))
        np.savetxt(os.path.join(args.outdir, "data.csv"),
                   np.asarray(m.obs), delimiter=",")
        frac = m.simulate_molfractions(jnp.asarray(KIN_TRUE, jnp.float32))
        np.savetxt(os.path.join(args.outdir, "data_mol.csv"),
                   np.asarray(frac), delimiter=",")
        m.cond.to_csv(os.path.join(args.outdir, "conditions.csv"), nx=m.nx)
        print(f"wrote data.csv, data_mol.csv, conditions.csv to {args.outdir}")
        return 0
    ts, obs, s0, S_true = generate_mm_pseudo_data(
        key=jax.random.key(args.seed) if args.seed else None,
        return_truth=True)
    for i in range(len(MM_S0_LIST)):
        P_true = s0[i] - S_true[i]
        path = os.path.join(args.outdir, f"mm_pseudo_data_{i}.csv")
        with open(path, "w") as f:
            f.write("t,S_true,P_true,P_obs\n")
            for row in zip(ts, S_true[i], P_true, obs[i]):
                f.write(",".join(repr(float(v)) for v in row) + "\n")
        print(f"wrote {path}")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="smc-tpu",
                                 description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run tempered-SMC inference")
    pr.add_argument("--model", default="mm",
                    choices=["mm", "methanation", "banana", "gmm", "lv",
                             "robertson", "robertson-dae"])
    pr.add_argument("--mm-method", default="rk4",
                    choices=["rk4", "dopri5", "exact", "pallas",
                             "pallas_exact"])
    pr.add_argument("--conditions", type=int, default=30)
    pr.add_argument("--chunk", type=int, default=512)
    pr.add_argument("--data-dir", default=None,
                    help="methanation real-data mode: directory holding "
                         "conditions.csv + data.csv")
    pr.add_argument("--information-csv", default=None,
                    help="methanation: load a reference-layout "
                         "information.csv (conditions + observed flows)")
    pr.add_argument("--datalist", default=None,
                    help="methanation: comma-separated experiment indices "
                         "to subset, e.g. 0,2 (the reference's datalist)")
    pr.add_argument("--nx", type=int, default=None,
                    help="methanation: reactor grid points (default 51, "
                         "the reference's NX)")
    _add_common(pr)
    pr.set_defaults(fn=cmd_run)

    ps = sub.add_parser("resume", help="resume from a checkpoint")
    ps.add_argument("--checkpoint", required=True)
    ps.add_argument("--model", default="mm",
                    choices=["mm", "methanation", "banana", "gmm"])
    ps.add_argument("--mm-method", default="rk4", choices=["rk4", "exact"])
    ps.add_argument("--conditions", type=int, default=30)
    ps.add_argument("--chunk", type=int, default=512)
    ps.add_argument("--datalist", default=None)
    ps.add_argument("--nx", type=int, default=None)
    _add_common(ps)
    ps.set_defaults(fn=cmd_resume)

    pm = sub.add_parser("map", help="gradient MAP point estimate "
                                    "(multi-start Adam; differentiable "
                                    "models only)")
    pm.add_argument("--model", default="mm",
                    choices=["mm", "methanation", "banana", "gmm", "lv",
                             "robertson", "robertson-dae"])
    pm.add_argument("--mm-method", default="exact",
                    choices=["rk4", "dopri5", "exact"])
    pm.add_argument("--conditions", type=int, default=30)
    pm.add_argument("--chunk", type=int, default=512)
    pm.add_argument("--datalist", default=None)
    pm.add_argument("--data-dir", default=None)
    pm.add_argument("--information-csv", default=None)
    pm.add_argument("--nx", type=int, default=None)
    pm.add_argument("--march", default="steady",
                    help="methanation march (MAP needs the differentiable "
                         "'steady' path)")
    pm.add_argument("--starts", type=int, default=8)
    pm.add_argument("--steps", type=int, default=800)
    pm.add_argument("--lr", type=float, default=0.1)
    pm.add_argument("--seed", type=int, default=0)
    pm.set_defaults(fn=cmd_map)

    pe = sub.add_parser("ensemble",
                        help="hierarchical multi-dataset MM ensemble")
    pe.add_argument("--datasets", type=int, default=4)
    pe.add_argument("--method", default="exact",
                    help="per-population MM likelihood (exact, rk4, "
                         "dopri5, pallas_exact — the last lowers all "
                         "populations to one batched kernel)")
    _add_common(pe)
    pe.set_defaults(fn=cmd_ensemble)

    pb = sub.add_parser("sbc",
                        help="simulation-based calibration check of the "
                             "sampler (rank-uniformity over replicate "
                             "posteriors; exit 0 iff calibrated)")
    pb.add_argument("--model", default="mm", choices=["mm", "methanation"])
    pb.add_argument("--replicates", type=int, default=64,
                    help="SBC replicates R; below 40 the chi-square test "
                         "is underpowered and the exit code falls back to "
                         "the mean-rank |z| < --z-max rule (--alpha is "
                         "then not used)")
    pb.add_argument("--particles", type=int, default=512)
    pb.add_argument("--rank-draws", type=int, default=63,
                    help="posterior draws ranked per replicate (L); any "
                         "value works — bins with unequal integer "
                         "coverage get per-bin expected counts")
    pb.add_argument("--mh-steps", type=int, default=5)
    pb.add_argument("--mh-steps-final", type=int, default=20)
    pb.add_argument("--alpha", type=float, default=1e-3,
                    help="chi-square rejection level per dimension "
                         "(ignored when --replicates < 40; see "
                         "--replicates)")
    pb.add_argument("--z-max", type=float, default=4.0,
                    help="mean-rank |z| threshold used instead of the "
                         "chi-square when --replicates < 40")
    pb.add_argument("--seed", type=int, default=0)
    pb.add_argument("--ranks-csv", default=None,
                    help="also write the (R, d) rank table to this CSV")
    pb.add_argument("--conditions", type=int, default=2,
                    help="methanation: experimental conditions")
    pb.add_argument("--nx", type=int, default=11,
                    help="methanation: reactor grid points (51 = the "
                         "reference's full grid)")
    pb.add_argument("--est", default="af-sigma",
                    choices=["af-sigma", "full"],
                    help="methanation estimated subset: 'af-sigma' = the "
                         "cheap 2-parameter suite config; 'full' = the "
                         "default 5-parameter set (Af, Eaf, Ar, Ear, "
                         "sigma) under the reference's prior bounds — "
                         "puts the Ar/Ear ridge inside the calibration "
                         "test")
    pb.add_argument("--chunk", type=int, default=64,
                    help="methanation: particle dispatch width")
    pb.add_argument("--granularity", default="fused",
                    choices=["fused", "sweep"],
                    help="'fused' = all replicates in one device program; "
                         "'sweep' bounds each device execution to one "
                         "ensemble mutation sweep (needed on the "
                         "single-chip tunnel for large R x N)")
    pb.add_argument("--quiet", action="store_true")
    pb.set_defaults(fn=cmd_sbc)

    pg = sub.add_parser("generate-data",
                        help="write pseudo-data CSVs (mm or methanation)")
    pg.add_argument("--model", default="mm", choices=["mm", "methanation"])
    pg.add_argument("--conditions", type=int, default=30)
    pg.add_argument("--outdir", default="data")
    pg.add_argument("--seed", type=int, default=0)
    pg.set_defaults(fn=cmd_generate_data)

    args = ap.parse_args(argv)
    # Persistent XLA compilation cache: repeat runs of the same config skip
    # the multi-minute TPU compile of the step program (SMC_TPU_CACHE=0
    # opts out). Done here, not at package import — importing smc_tpu must
    # stay free of config/device side effects.
    from smc_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
