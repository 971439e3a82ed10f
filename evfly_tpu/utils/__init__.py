from .ev_vis import bin_evim, simple_evim, visualize_evim

__all__ = ["bin_evim", "simple_evim", "visualize_evim"]
