from .ev_vis import bin_evim, simple_evim, visualize_evim
from .profiling import StageTimer, timed_device_fn, xla_trace

__all__ = ["bin_evim", "simple_evim", "visualize_evim", "StageTimer", "timed_device_fn", "xla_trace"]
