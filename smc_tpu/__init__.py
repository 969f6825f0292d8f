"""smc-tpu: TPU-native likelihood-tempered Sequential Monte Carlo.

A from-scratch JAX/XLA rebuild of the capabilities of
``maruchitatsuki/python-based-Sequential-Monte-Carlo-method-with-likelihood-tempering``:
Bayesian parameter estimation for ODE/DAE simulators via SMC with adaptive
likelihood tempering, residual-systematic resampling, and adaptive
random-walk Metropolis mutation — with the particle axis sharded over a
TPU device mesh instead of Ray tasks over CPU cores.
"""
from smc_tpu.config import SMCConfig
from smc_tpu.priors import Prior
from smc_tpu.smc.state import SMCState
from smc_tpu.smc.driver import (init_state, make_smc_step, make_run_on_device,
                                make_sweep_step_fns, run_smc,
                                run_smc_on_device)
from smc_tpu.smc.kernels import (
    find_gamma,
    make_mutation_sweeper,
    residual_systematic_resample,
    hmc_mutation,
    mala_mutation,
    mh_mutation,
    mutate,
)
from smc_tpu.opt import MAPResult, map_estimate

__version__ = "0.1.0"
