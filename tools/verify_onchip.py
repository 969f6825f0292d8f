"""On-chip verify drive (the /verify skill's flagship flow + this round's
new surfaces): MM posterior, -inf guard, degenerate covariance, the
--max-restarts resilient CLI path, .smcd round-trip, and the BABE DAE
solver vs the default engine. Run detached on the real TPU."""
import json, os, time
import jax, numpy as np
print("devices:", jax.devices(), flush=True)
from smc_tpu import SMCConfig, run_smc
from smc_tpu.models.michaelis_menten import MichaelisMentenModel
from smc_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
t0 = time.time()
model = MichaelisMentenModel.default(method="rk4")
state = run_smc(model, SMCConfig(n_particles=1000), jax.random.key(0))
p = np.asarray(state.particles)
print("gamma", float(state.gamma), "mean", p.mean(0), "std", p.std(0),
      f"wall {time.time()-t0:.1f}s", flush=True)
assert float(state.gamma) == 1.0
truth = np.array([1.2, 0.5, 0.02])
assert np.all(np.abs(p.mean(0) - truth) < 5 * p.std(0))
bad = jax.numpy.asarray([[1.2, 0.5, -1.0]])
ll, _ = jax.jit(model.log_likelihood)(bad)
assert np.isneginf(np.asarray(ll))[0], ll
s8 = run_smc(model, SMCConfig(n_particles=8), jax.random.key(1), verbose=False)
assert np.isfinite(np.asarray(s8.particles)).all()
from smc_tpu.cli import main
rc = main(["run", "--model", "mm", "--mm-method", "rk4", "--particles",
           "256", "--max-restarts", "2", "--outdir", "/tmp/verify_runs_r4b",
           "--quiet", "--no-plots"])
assert rc == 0
run = sorted(os.listdir("/tmp/verify_runs_r4b"))[-1]
assert os.path.exists(f"/tmp/verify_runs_r4b/{run}/checkpoints/latest.npz")
from smc_tpu.io.checkpoint import save_state_chunked, load_state
pth = save_state_chunked("/tmp/verify_r4b_ck", s8, max_bytes=256)
st = load_state(pth)
np.testing.assert_array_equal(np.asarray(st.particles), np.asarray(s8.particles))
# BABE solver compiled on the real chip vs the default engine
import jax.numpy as jnp
from smc_tpu.models.methanation import MethanationModel, KIN_TRUE
mt = MethanationModel.default(n_conditions=2, nx=11, particle_chunk=8,
                              solver="thomas")
mb = MethanationModel.default(n_conditions=2, nx=11, particle_chunk=8,
                              solver="babe")
th = mt.prior.sample(jax.random.key(0), 16)
ll_t = np.asarray(jax.jit(mt.log_likelihood)(th)[0])
ll_b = np.asarray(jax.jit(mb.log_likelihood)(th)[0])
np.testing.assert_allclose(ll_b, ll_t, rtol=1e-3, atol=1e-2)
print("babe-on-chip ll parity ok", flush=True)
print("VERIFY_R4_PASS", flush=True)
