from . import datasets
from .checkpoint import load_checkpoint, save_checkpoint

__all__ = ["datasets", "save_checkpoint", "load_checkpoint"]
