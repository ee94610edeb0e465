"""Device mesh, shardings, and the SPMD train step.

The reference is single-process/single-device — its only parallelism is
intra-device "matrix mode" batching (SURVEY.md §2.9).  This module is the
TPU-native scaling layer that replaces it:

* a named :class:`jax.sharding.Mesh` with a ``data`` axis (batch +
  per-sample Hutchinson probes are sharded along it) and an optional
  ``model`` axis reserved for tensor-parallel wide dynamics nets;
* ``jax.jit`` with ``in_shardings``/``out_shardings`` (pjit): XLA inserts the
  ``psum`` collectives for the loss mean and the gradient all-reduce — there
  is no hand-written NCCL/MPI analogue to port;
* **collective-consistent adaptivity**: because the whole train step is one
  SPMD program and the Dopri5 error norm is a global reduction over the
  sharded state (ops/ode.py:_rms_error_ratio), every device computes the same
  accept/reject decision and step size by construction — the hard requirement
  called out in SURVEY.md §5;
* ``initialize_distributed`` wires multi-host runs
  (``jax.distributed.initialize``): collectives ride ICI within a slice and
  DCN across slices, chosen by XLA from the mesh axis order.

Randomness: probe/steer keys are ordinary jit inputs; under pjit the sampled
probe array inherits the batch sharding, so each device holds independent
probe rows without explicit key folding.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch_arrays",
    "shard_train_step",
    "initialize_distributed",
]

Pytree = Any


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up (``jax.distributed.initialize``).  No-op when the
    runtime is already initialized or single-process."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
    axis_names: Tuple[str, ...] = ("data", "model"),
) -> Mesh:
    """Build a ``data x model`` mesh.  ``data`` defaults to
    ``len(devices) // model`` — pure data parallelism."""
    devices = list(devices) if devices is not None else list(jax.devices())
    if data is None:
        data = len(devices) // model
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-major arrays: rows split along the ``data`` axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, xs: jax.Array, ys: Optional[jax.Array] = None):
    """Place the dataset with rows sharded over the ``data`` axis (the
    host-to-mesh boundary; reference analogue: the one device move at
    mlj_ext/core_icnf.jl:37-39)."""
    sh = data_sharding(mesh)
    xs = jax.device_put(xs, sh)
    if ys is not None:
        ys = jax.device_put(ys, sh)
    return xs, ys


def shard_train_step(
    step: Callable[..., Tuple[Pytree, Pytree, jax.Array]],
    mesh: Mesh,
    conditional: bool = False,
):
    """jit the train step over the mesh: params/opt-state replicated, batch
    sharded on ``data``.  XLA turns the global loss mean + ``jax.grad`` into
    per-device compute with one gradient ``psum`` over ICI."""
    repl = replicated(mesh)
    batch_sh = data_sharding(mesh)
    ys_sh = batch_sh if conditional else None
    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, batch_sh, ys_sh),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
