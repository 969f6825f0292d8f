from smc_tpu.parallel.mesh import make_mesh, particle_sharding, shard_state, run_smc_sharded
