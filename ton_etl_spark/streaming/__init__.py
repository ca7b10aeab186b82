from .metrics import BatchMetricsListener, attach_metrics_listener

__all__ = ["BatchMetricsListener", "attach_metrics_listener"]
