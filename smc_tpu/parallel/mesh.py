"""Device-mesh parallelism for the particle axis.

The reference's only parallelism is one Ray task per particle gathered with a
``ray.get`` barrier (SMC_example/Micmem_likelihood.py:79-92,
SMC_methanation/methanation_functions.py:70-92, ``ray.init(num_cpus=30)``).
The TPU-native equivalent: particles (N, d) and cached log-likelihoods (N,)
are sharded over a 1-D ``jax.sharding.Mesh`` axis named "particles"; the SMC
step is the SAME jitted function as on one device — XLA's SPMD partitioner
inserts the collectives:

- max-log-lik / weight-sum / ESS / acceptance counts -> pmax/psum over ICI
  (the reference's host-side np.max/np.sum at SMC_methanation_main.py:212-230);
- proposal covariance (d x N)@(N x d) -> local matmul + psum;
- resampling's cumsum + searchsorted + take -> prefix-sum collective and a
  cross-shard gather (the particle exchange that Ray did by object store).

Scalars (gamma, step, diagnostics) are replicated. No scatter/gather code
exists here at all — sharding is carried entirely by input shardings.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smc_tpu.config import SMCConfig
from smc_tpu.smc.driver import init_state, run_smc, run_smc_on_device
from smc_tpu.smc.state import SMCState

PARTICLE_AXIS = "particles"
DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, n_data: int = 1) -> Mesh:
    """1-D (or 2-D particles x data) mesh over the first n_devices devices.

    ``n_data > 1`` carves a second axis for sharding the per-particle
    experiment/condition dimension (the methanation model's 30 conditions) —
    the SP-analog for this workload.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(
            f"make_mesh({n_devices}) but only {len(devs)} device(s) exist; "
            f"for a virtual multi-device CPU mesh set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
            f"and jax.config.update('jax_platforms', 'cpu') before first "
            f"device use (see tests/conftest.py)")
    if n_devices % n_data != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by n_data={n_data}")
    arr = np.asarray(devs[:n_devices]).reshape(n_devices // n_data, n_data)
    return Mesh(arr, (PARTICLE_AXIS, DATA_AXIS))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (N, ...) particle-major arrays."""
    return NamedSharding(mesh, P(PARTICLE_AXIS))


def shard_state(state: SMCState, mesh: Mesh) -> SMCState:
    """Place particle-axis arrays sharded, everything else replicated."""
    psh = particle_sharding(mesh)
    rep = NamedSharding(mesh, P())
    sharded = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
    return sharded.replace(
        particles=jax.device_put(state.particles, psh),
        log_lik=jax.device_put(state.log_lik, psh),
    )


def run_smc_sharded(model, cfg: SMCConfig, key: jax.Array, mesh: Mesh,
                    on_device: bool = False, verbose: bool = True) -> SMCState:
    """Full SMC run with the particle axis sharded over ``mesh``.

    The particle count must be divisible by the particle-axis size (static
    shapes; pad the particle count, not the data).
    """
    n_shards = mesh.shape[PARTICLE_AXIS]
    if cfg.n_particles % n_shards != 0:
        raise ValueError(
            f"n_particles={cfg.n_particles} not divisible by particle-axis "
            f"size {n_shards}")
    state = shard_state(init_state(key, model, cfg), mesh)
    psh = particle_sharding(mesh)
    if on_device:
        return run_smc_on_device(model, cfg, key, state=state, psharding=psh)
    return run_smc(model, cfg, key, state=state, verbose=verbose,
                   psharding=psh)
