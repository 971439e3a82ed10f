from .learner import Learner
from .losses import combined_loss, velocity_loss, vision_loss

__all__ = ["Learner", "combined_loss", "velocity_loss", "vision_loss"]
