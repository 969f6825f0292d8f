from smc_tpu.smc.state import SMCState
from smc_tpu.smc.kernels import (
    find_gamma,
    make_mutation_sweeper,
    residual_systematic_resample,
    hmc_mutation,
    mala_mutation,
    mh_mutation,
    mutate,
)
from smc_tpu.smc.driver import init_state, make_smc_step, run_smc, run_smc_on_device
