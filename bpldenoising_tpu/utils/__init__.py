from .checkpoint import CheckpointWriter, load_checkpoint, save_checkpoint
from .config import Params, merge
from .profiling import SectionTimer, trace

__all__ = [
    "Params", "merge",
    "save_checkpoint", "load_checkpoint", "CheckpointWriter",
    "trace", "SectionTimer",
]
