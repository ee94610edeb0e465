from . import datasets, profiling
from .checkpoint import AsyncCheckpointer, load_checkpoint, save_checkpoint

__all__ = ["datasets", "profiling", "save_checkpoint", "load_checkpoint", "AsyncCheckpointer"]
