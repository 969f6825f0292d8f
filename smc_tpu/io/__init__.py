from smc_tpu.io.rundir import RunDir
from smc_tpu.io.checkpoint import save_state, load_state
from smc_tpu.io.csvio import save_posterior_csv, save_particles_csv
