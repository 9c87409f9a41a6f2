from titok_tpu.metrics.eval_metrics import EvalMetrics  # noqa: F401
