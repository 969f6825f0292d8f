from smc_tpu.ops.ode import rk4_grid, dopri5_grid
from smc_tpu.ops.lambertw import lambertw
