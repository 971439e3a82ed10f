from .accumulator import EventAccumulator, frame_from_accumulated
from .pipeline import StreamingPipeline
from .deploy import DeploymentRunner, SafetyConfig

__all__ = ["EventAccumulator", "frame_from_accumulated", "StreamingPipeline", "DeploymentRunner", "SafetyConfig"]
