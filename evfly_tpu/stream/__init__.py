from .accumulator import EventAccumulator, frame_from_accumulated
from .pipeline import StreamingPipeline

__all__ = ["EventAccumulator", "frame_from_accumulated", "StreamingPipeline"]
