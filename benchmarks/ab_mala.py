"""A/B: RWM vs MALA vs HMC mutation — mixing quality at matched cost.

Run on the real chip:  python benchmarks/ab_mala.py

Protocol: same model, same seeds, R replicas each. We compare
- total likelihood evaluations to reach gamma=1 (the cost unit of the
  whole framework — each MALA eval additionally pays one VJP, ~2x an RWM
  eval on these closed-form targets, so MALA must win on evals by >2x to
  win on wall clock; on simulator targets the VJP is ~1 extra fwd),
- posterior moment error vs the analytic truth across replicas (mixing
  failure shows up as between-replica scatter and std bias).

Targets:
- corr-gauss-16: N(mu, C) likelihood in d=16 with strong equicorrelation
  (rho=0.9) — the empirical-covariance preconditioner captures C, but RWM
  still pays the O(d) random-walk tax; MALA's drift should cut the
  evals-to-converged and the replica scatter.
- banana: the curved ridge (models/synthetic.py) at d=2.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu import SMCConfig, run_smc
from smc_tpu.priors import Prior


@dataclasses.dataclass(frozen=True)
class CorrGauss:
    d: int = 16
    rho: float = 0.9
    prior: Prior = None
    param_names: tuple = ()

    def __post_init__(self):
        object.__setattr__(self, "prior",
                           Prior.uniform([-6.0] * self.d, [6.0] * self.d))
        object.__setattr__(self, "param_names",
                           tuple(f"x{i}" for i in range(self.d)))
        c = np.full((self.d, self.d), self.rho, np.float64)
        np.fill_diagonal(c, 1.0)
        object.__setattr__(self, "_prec",
                           jnp.asarray(np.linalg.inv(c), jnp.float32))
        object.__setattr__(self, "mu", jnp.ones((self.d,), jnp.float32))

    def log_likelihood(self, theta):
        z = theta - self.mu
        return -0.5 * jnp.einsum("ni,ij,nj->n", z, self._prec, z), None


def run(model, mutation, n, seeds):
    out = []
    for s in seeds:
        cfg = SMCConfig(n_particles=n, mutation=mutation)
        st = run_smc(model, cfg, jax.random.key(s), verbose=False)
        p = np.asarray(st.particles)
        out.append((float(st.total_lik_evals), int(st.step),
                    p.mean(0), p.std(0)))
    evals = np.asarray([o[0] for o in out])
    steps = np.asarray([o[1] for o in out])
    means = np.stack([o[2] for o in out])
    stds = np.stack([o[3] for o in out])
    return evals, steps, means, stds


def report(tag, model, true_mean, true_std, n=2048, seeds=(0, 1, 2, 3)):
    # HMC evals already include the leapfrog multiplier
    # (cfg.evals_per_sweep in the driver accounting), so the three rows
    # share one cost unit: likelihood evaluations (each gradient kernel's
    # eval additionally carries one VJP, ~2x on these closed-form targets).
    for mut in ("rwm", "mala", "hmc"):
        evals, steps, means, stds = run(model, mut, n, seeds)
        me = np.abs(means - true_mean).mean()
        se = np.abs(stds / true_std - 1.0).mean()
        scatter = means.std(0).mean()
        print(f"{tag:14s} {mut:5s} evals={evals.mean():>12.0f} "
              f"steps={steps.mean():5.1f} |mean err|={me:.4f} "
              f"std rel err={se:.4f} replica scatter={scatter:.4f}",
              flush=True)


if __name__ == "__main__":
    m = CorrGauss()
    c = np.full((16, 16), 0.9); np.fill_diagonal(c, 1.0)
    report("corr-gauss-16", m, np.ones(16), np.sqrt(np.diag(c)))

    from smc_tpu.models.synthetic import BananaModel
    b = BananaModel()
    # pseudo-truth: one 2^17-particle run (both kernels agree at that N;
    # MC error ~ std/sqrt(ESS) << the replica effects measured above).
    st = run_smc(b, SMCConfig(n_particles=1 << 17), jax.random.key(99),
                 verbose=False)
    pb = np.asarray(st.particles)
    report("banana", b, pb.mean(0), pb.std(0))
