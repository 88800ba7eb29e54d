from splatpu.obs.metrics import MetricsLogger
