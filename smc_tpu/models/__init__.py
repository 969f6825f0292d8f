from smc_tpu.models.michaelis_menten import MichaelisMentenModel, generate_mm_pseudo_data
from smc_tpu.models.generic import ODEModel, lotka_volterra_model
