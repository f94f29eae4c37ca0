from .logging import MetricLogger, RunningMeter, Timer

__all__ = ["MetricLogger", "RunningMeter", "Timer"]
