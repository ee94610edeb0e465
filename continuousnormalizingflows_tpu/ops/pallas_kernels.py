"""Pallas TPU kernel: fused dynamics MLP forward + Hutchinson VJP probe.

The hot inner loop of ICNF training (SURVEY.md §2.3, reference
``augmented_f`` icnf.jl:517-559) evaluates, per ODE stage per batch:

    y    = MLP(x)                      (3 matmuls + softplus)
    epsJ = eps^T ∂y/∂x                 (3 transposed matmuls + sigmoid gates)
    div  = sum(epsJ_z * eps),  reg_z = ||y||,  reg_j = ||epsJ_z||

XLA runs this as ~6 separate matmul kernels with the ``(B, h)`` activations
round-tripping through HBM.  For the small hidden widths typical of ICNF
dynamics nets the computation is HBM-bandwidth-bound, so fusing the whole
chain into one Pallas kernel — weights resident in VMEM, activations never
leaving VMEM, one read of ``x``/``eps``, one write of the outputs — removes
most of the memory traffic.

Layout notes:
* all widths are zero-padded to the 128-lane boundary.  Zero-padding is
  *exact* here: padded hidden units have softplus(0) activations but their
  outgoing weights are zero, and the backward gates multiply by zero-padded
  weight rows, so every padded output/probe column is exactly 0.
* batch is the grid dimension (``TILE_B`` rows per program); weights use a
  constant index map so every program reuses the same VMEM-resident copy.
* matmuls accumulate in float32 on the MXU (``preferred_element_type``).

The op is exposed as :func:`fused_dynamics_vjp` with a ``jax.custom_vjp``
whose backward pass uses the pure-JAX reference formula (XLA), so the op is
fully differentiable (needed by both backprop-through-scan and the adjoint's
in-solve VJPs); a hand-written backward kernel is a later optimization.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_dynamics_vjp", "mlp3_forward_vjp_reference", "pad_mlp3_params"]

LANE = 128


def _pad_to(n: int, m: int = LANE) -> int:
    return ((n + m - 1) // m) * m


def pad_mlp3_params(params, n_in: int, h: int, n_out: int):
    """Zero-pad 3-layer MLP params to lane-aligned shapes.

    ``params``: the list-of-dicts layout of
    :class:`~continuousnormalizingflows_tpu.models.nets.MLP` with widths
    ``(n_in, h, h, n_out)``.
    """
    ip, hp, op = _pad_to(n_in), _pad_to(h), _pad_to(n_out)
    w1 = jnp.zeros((ip, hp), jnp.float32).at[:n_in, :h].set(params[0]["w"])
    b1 = jnp.zeros((1, hp), jnp.float32).at[0, :h].set(params[0]["b"])
    w2 = jnp.zeros((hp, hp), jnp.float32).at[:h, :h].set(params[1]["w"])
    b2 = jnp.zeros((1, hp), jnp.float32).at[0, :h].set(params[1]["b"])
    w3 = jnp.zeros((hp, op), jnp.float32).at[:h, :n_out].set(params[2]["w"])
    b3 = jnp.zeros((1, op), jnp.float32).at[0, :n_out].set(params[2]["b"])
    return (w1, b1, w2, b2, w3, b3)


def _kernel(nz: int, op: int, x_ref, eps_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            w3_ref, b3_ref, y_ref, epsj_ref, stats_ref):
    """One batch tile: forward + probe VJP + reductions, all in VMEM.

    ``eps_ref`` carries the probe padded to the *input* width ``ip`` (only the
    first ``nz <= op <= ip`` columns are nonzero), so the div product needs no
    reshaping; the lane-aligned slice ``eps[:, :op]`` feeds the W3 dot.
    """
    f32 = jnp.float32
    x = x_ref[:]
    eps = eps_ref[:]

    # ---- forward (MXU) ----
    z1 = jnp.dot(x, w1_ref[:], preferred_element_type=f32) + b1_ref[:]
    h1 = jax.nn.softplus(z1)
    z2 = jnp.dot(h1, w2_ref[:], preferred_element_type=f32) + b2_ref[:]
    h2 = jax.nn.softplus(z2)
    y = jnp.dot(h2, w3_ref[:], preferred_element_type=f32) + b3_ref[:]
    y_ref[:] = y

    # ---- probe VJP: eps^T J, J = dy/dx (reverse sweep, sigmoid = softplus')
    d2 = jnp.dot(eps[:, :op], w3_ref[:].T, preferred_element_type=f32) * jax.nn.sigmoid(z2)
    d1 = jnp.dot(d2, w2_ref[:].T, preferred_element_type=f32) * jax.nn.sigmoid(z1)
    epsj = jnp.dot(d1, w1_ref[:].T, preferred_element_type=f32)
    epsj_ref[:] = epsj

    # ---- reductions (VPU): trace probe + regularizer norms ----
    # div uses only the first nz input columns (the flow-state block);
    # padded/time/condition columns are masked out.
    col = jax.lax.broadcasted_iota(jnp.int32, epsj.shape, dimension=1)
    zmask = (col < nz).astype(f32)
    epsj_z = epsj * zmask
    div = jnp.sum(epsj_z * eps, axis=1, keepdims=True)
    reg_z = jnp.sqrt(jnp.sum(y * y, axis=1, keepdims=True))
    reg_j = jnp.sqrt(jnp.sum(epsj_z * epsj_z, axis=1, keepdims=True))
    stats_ref[:, 0:1] = div
    stats_ref[:, 1:2] = reg_z
    stats_ref[:, 2:3] = reg_j


def _fused_call(x_p, eps_p, padded_params, nz: int, tile_b: int):
    b = x_p.shape[0]
    ip = x_p.shape[1]  # eps_p is padded to ip as well
    w1, b1, w2, b2, w3, b3 = padded_params
    hp = w1.shape[1]
    op = w3.shape[1]

    grid = (b // tile_b,)
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)

    kernel = functools.partial(_kernel, nz, op)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, ip), row, memory_space=pltpu.VMEM),   # x
            pl.BlockSpec((tile_b, ip), row, memory_space=pltpu.VMEM),   # eps
            pl.BlockSpec((ip, hp), const, memory_space=pltpu.VMEM),     # w1
            pl.BlockSpec((1, hp), const, memory_space=pltpu.VMEM),      # b1
            pl.BlockSpec((hp, hp), const, memory_space=pltpu.VMEM),     # w2
            pl.BlockSpec((1, hp), const, memory_space=pltpu.VMEM),      # b2
            pl.BlockSpec((hp, op), const, memory_space=pltpu.VMEM),     # w3
            pl.BlockSpec((1, op), const, memory_space=pltpu.VMEM),      # b3
        ],
        out_specs=[
            pl.BlockSpec((tile_b, op), row, memory_space=pltpu.VMEM),   # y
            pl.BlockSpec((tile_b, ip), row, memory_space=pltpu.VMEM),   # epsJ
            pl.BlockSpec((tile_b, LANE), row, memory_space=pltpu.VMEM), # stats
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, op), jnp.float32),
            jax.ShapeDtypeStruct((b, ip), jnp.float32),
            jax.ShapeDtypeStruct((b, LANE), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (2 * ip * hp + 2 * hp * hp + 2 * hp * op),
            bytes_accessed=4 * b * (2 * ip + 2 * op + LANE)
            + 4 * (ip * hp + hp * hp + hp * op),
            transcendentals=4 * b * hp,
        ),
        # off-TPU (CPU tests) the kernel runs in interpreter mode so the
        # same math is validated without Mosaic
        interpret=jax.default_backend() != "tpu",
    )(x_p, eps_p, w1, b1, w2, b2, w3, b3)


def mlp3_forward_vjp_reference(x, eps, params, nz: int):
    """Pure-JAX reference of the fused op (unpadded shapes) — used for the
    custom backward pass and for correctness tests."""
    w1, b1, w2, b2 = params[0]["w"], params[0]["b"], params[1]["w"], params[1]["b"]
    w3, b3 = params[2]["w"], params[2]["b"]
    z1 = x @ w1 + b1
    h1 = jax.nn.softplus(z1)
    z2 = h1 @ w2 + b2
    h2 = jax.nn.softplus(z2)
    y = h2 @ w3 + b3
    d2 = (eps @ w3.T) * jax.nn.sigmoid(z2)
    d1 = (d2 @ w2.T) * jax.nn.sigmoid(z1)
    epsj = d1 @ w1.T
    epsj_z = epsj[:, :nz]
    div = jnp.sum(epsj_z * eps[:, :nz], axis=-1)
    reg_z = jnp.sqrt(jnp.sum(y * y, axis=-1))
    reg_j = jnp.sqrt(jnp.sum(epsj_z * epsj_z, axis=-1))
    return y, epsj_z, div, reg_z, reg_j


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_dynamics_vjp(x, eps, params, nz: int, tile_b: int = 256):
    """Fused MLP forward + probe VJP + reductions.

    Args:
      x: ``(B, n_in)`` net input (flow state ++ time ++ conditions).
      eps: ``(B, n_out)`` Hutchinson probe (``n_out == nz``).
      params: 3-layer MLP params (list-of-dicts).
      nz: width of the flow-state block at the front of ``x``.
      tile_b: batch rows per Pallas program.

    Returns ``(y, epsj_z, div, reg_z, reg_j)`` with shapes
    ``(B, n_out), (B, nz), (B,), (B,), (B,)``.
    """
    n_in = x.shape[1]
    h = params[0]["w"].shape[1]
    n_out = params[2]["w"].shape[1]
    b = x.shape[0]
    tb = min(tile_b, b)
    if b % tb != 0 or tb % 8 != 0:
        # awkward batch: fall back to the XLA path
        return mlp3_forward_vjp_reference(x, eps, params, nz)

    ip = _pad_to(n_in)
    x_p = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, ip - n_in)))
    eps_p = jnp.pad(eps.astype(jnp.float32), ((0, 0), (0, ip - n_out)))
    padded = pad_mlp3_params(params, n_in, h, n_out)

    y_p, epsj_p, stats = _fused_call(x_p, eps_p, padded, nz, tb)
    y = y_p[:, :n_out]
    epsj_z = epsj_p[:, :nz]
    return y, epsj_z, stats[:, 0], stats[:, 1], stats[:, 2]


def _fused_fwd(x, eps, params, nz, tile_b):
    out = fused_dynamics_vjp(x, eps, params, nz, tile_b)
    return out, (x, eps, params)


def _fused_bwd(nz, tile_b, residuals, cotangents):
    x, eps, params = residuals
    _, vjp_fn = jax.vjp(
        lambda x_, eps_, p_: mlp3_forward_vjp_reference(x_, eps_, p_, nz),
        x, eps, params,
    )
    return vjp_fn(cotangents)


fused_dynamics_vjp.defvjp(_fused_fwd, _fused_bwd)
