from smc_tpu.utils.metrics import MetricsLogger, profile_trace
