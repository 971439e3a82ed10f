from .dataloading import ConcatFrames, TrajectorySplit, concat_frames, dataloader, write_h5_dataset
from .augment import augment_chunk

__all__ = [
    "dataloader",
    "TrajectorySplit",
    "write_h5_dataset",
    "augment_chunk",
    "ConcatFrames",
    "concat_frames",
]
