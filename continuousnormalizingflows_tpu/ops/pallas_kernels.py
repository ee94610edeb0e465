"""Pallas TPU kernels: fused dynamics MLP forward + Hutchinson VJP probe,
with a hand-derived fused backward.

The hot inner loop of ICNF training (SURVEY.md §2.3, reference
``augmented_f`` icnf.jl:517-559) evaluates, per ODE stage per batch:

    y    = MLP(x)                      (3 matmuls + softplus)
    epsJ = eps^T ∂y/∂x                 (3 transposed matmuls + sigmoid gates)
    div  = sum(epsJ_z * eps),  reg_z = ||y||,  reg_j = ||epsJ_z||

XLA runs this as ~6 separate matmul kernels with the ``(B, h)`` activations
round-tripping through HBM, and its reverse pass doubles that traffic.  The
two kernels here keep weights and activations VMEM-resident:

* ``_fwd_kernel`` — the forward chain above in one launch.
* ``_bwd_kernel`` — the full cotangent chain for ``(y, epsJ_z, div, reg_z,
  reg_j)`` w.r.t. ``(x, eps, params)``, recomputing the forward in-kernel
  (cheaper than spilling residuals to HBM).  Because the primal already
  contains first derivatives (the probe VJP), this backward carries the
  second-order terms: the sigmoid-gate path contributes
  ``z̄ = d̄ ⊙ u ⊙ σ'(z)`` alongside the standard MLP backward, and weight
  gradients receive both the forward-path (``xᵀ z̄``) and probe-path
  (``Ēᵀ d``) contributions.  Weight/bias gradients are accumulated in VMEM
  across batch-tile grid steps (TPU grids execute sequentially).

Layout notes:
* all widths zero-padded to the 128-lane boundary; padding is *exact* (padded
  hidden units have zero outgoing weights, so every padded output/probe/grad
  entry is exactly 0 — including in the backward, where each contribution is
  right-multiplied by a zero-padded factor or masked by ``zmask``).
* ``eps`` is carried padded to the *input* width ``ip`` so the div product
  needs no reshaping; the lane-aligned slice ``eps[:, :op]`` feeds the W3 dot.
* matmuls accumulate in float32 (``preferred_element_type``); pass
  ``compute_dtype=jnp.bfloat16`` to cast matmul operands (MXU bf16 passes,
  ~3x faster than the float32-accurate mode).

Exposed as :func:`fused_dynamics_vjp` (a ``jax.custom_vjp``), so both
backprop-through-scan and the continuous adjoint differentiate through it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_dynamics_vjp", "mlp3_forward_vjp_reference", "pad_mlp3_params"]

LANE = 128


def _pad_to(n: int, m: int = LANE) -> int:
    return ((n + m - 1) // m) * m


def _interpret() -> bool:
    # off-TPU (CPU tests) kernels run in interpreter mode so the same math is
    # validated without Mosaic
    return jax.default_backend() != "tpu"


def pad_mlp3_params(params, n_in: int, h: int, n_out: int):
    """Zero-pad 3-layer MLP params to lane-aligned shapes (list-of-dicts
    layout of :class:`~continuousnormalizingflows_tpu.models.nets.MLP`)."""
    ip, hp, op = _pad_to(n_in), _pad_to(h), _pad_to(n_out)
    w1 = jnp.zeros((ip, hp), jnp.float32).at[:n_in, :h].set(params[0]["w"])
    b1 = jnp.zeros((1, hp), jnp.float32).at[0, :h].set(params[0]["b"])
    w2 = jnp.zeros((hp, hp), jnp.float32).at[:h, :h].set(params[1]["w"])
    b2 = jnp.zeros((1, hp), jnp.float32).at[0, :h].set(params[1]["b"])
    w3 = jnp.zeros((hp, op), jnp.float32).at[:h, :n_out].set(params[2]["w"])
    b3 = jnp.zeros((1, op), jnp.float32).at[0, :n_out].set(params[2]["b"])
    return (w1, b1, w2, b2, w3, b3)


def _make_dot(cdt):
    f32 = jnp.float32

    # cdt=None must be genuinely float32-accurate: Mosaic's default matmul
    # runs bf16 passes even for f32 operands, so request HIGHEST explicitly.
    def dot(a, b):
        if cdt is not None:
            a = a.astype(cdt)
            b = b.astype(cdt)
            return jnp.dot(a, b, preferred_element_type=f32)
        return jnp.dot(a, b, preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)

    return dot


def _recompute_forward(dot, x, eps, op, w1, b1, w2, b2, w3, b3):
    """Shared forward chain (used by both kernels)."""
    z1 = dot(x, w1) + b1
    s1 = jax.nn.sigmoid(z1)
    h1 = jax.nn.softplus(z1)
    z2 = dot(h1, w2) + b2
    s2 = jax.nn.sigmoid(z2)
    h2 = jax.nn.softplus(z2)
    y = dot(h2, w3) + b3
    u2 = dot(eps[:, :op], w3.T)
    d2 = u2 * s2
    u1 = dot(d2, w2.T)
    d1 = u1 * s1
    e = dot(d1, w1.T)
    return z1, s1, h1, z2, s2, h2, y, u2, d2, u1, d1, e


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(nz: int, op: int, cdt, x_ref, eps_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, w3_ref, b3_ref, y_ref, epsj_ref, stats_ref):
    f32 = jnp.float32
    dot = _make_dot(cdt)
    x = x_ref[:]
    eps = eps_ref[:]
    (_z1, _s1, _h1, _z2, _s2, _h2, y, _u2, _d2, _u1, _d1, e) = _recompute_forward(
        dot, x, eps, op, w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:]
    )
    y_ref[:] = y
    epsj_ref[:] = e

    col = jax.lax.broadcasted_iota(jnp.int32, e.shape, dimension=1)
    zmask = (col < nz).astype(f32)
    e_z = e * zmask
    stats_ref[:, 0:1] = jnp.sum(e_z * eps, axis=1, keepdims=True)
    stats_ref[:, 1:2] = jnp.sqrt(jnp.sum(y * y, axis=1, keepdims=True) + 1e-20)
    stats_ref[:, 2:3] = jnp.sqrt(jnp.sum(e_z * e_z, axis=1, keepdims=True) + 1e-20)


def _fwd_call(x_p, eps_p, padded, nz: int, tile_b: int, cdt):
    b, ip = x_p.shape
    w1, b1, w2, b2, w3, b3 = padded
    hp, op = w1.shape[1], w3.shape[1]
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nz, op, cdt),
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, ip), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, ip), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ip, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, op), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, op), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, op), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, ip), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, LANE), row, memory_space=pltpu.VMEM),
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
        interpret=_interpret(),
    )(x_p, eps_p, w1, b1, w2, b2, w3, b3)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(nz: int, op: int, cdt, x_ref, eps_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, w3_ref, b3_ref, ybar_ref, ebar_ref, sbar_ref,
                xbar_ref, epsbar_ref, w1b_ref, b1b_ref, w2b_ref, b2b_ref,
                w3b_ref, b3b_ref):
    f32 = jnp.float32
    dot = _make_dot(cdt)
    x = x_ref[:]
    eps = eps_ref[:]
    w1, w2, w3 = w1_ref[:], w2_ref[:], w3_ref[:]
    (z1, s1, h1, z2, s2, h2, y, u2, d2, u1, d1, e) = _recompute_forward(
        dot, x, eps, op, w1, b1_ref[:], w2_ref[:], b2_ref[:], w3, b3_ref[:]
    )
    col = jax.lax.broadcasted_iota(jnp.int32, e.shape, dimension=1)
    zmask = (col < nz).astype(f32)
    e_z = e * zmask

    # ---- merge incoming cotangents ----
    ybar = ybar_ref[:]                       # (B, op)
    ebar = ebar_ref[:]                       # (B, ip), nonzero cols < nz only
    divbar = sbar_ref[:, 0:1]
    rzbar = sbar_ref[:, 1:2]
    rjbar = sbar_ref[:, 2:3]
    ry = jnp.sqrt(jnp.sum(y * y, axis=1, keepdims=True) + 1e-20)
    re = jnp.sqrt(jnp.sum(e_z * e_z, axis=1, keepdims=True) + 1e-20)
    ybar_t = ybar + rzbar * y / ry                                  # (B, op)
    ebar_t = (ebar + divbar * eps + rjbar * e_z / re) * zmask       # (B, ip)

    # ---- probe-VJP path (second-order terms) ----
    d1bar = dot(ebar_t, w1)                  # e = d1 W1^T
    u1bar = d1bar * s1
    z1_b = d1bar * u1 * s1 * (1.0 - s1)      # via d1 = u1 * sigmoid(z1)
    d2bar = dot(u1bar, w2)                   # u1 = d2 W2^T
    u2bar = d2bar * s2
    z2_b = d2bar * u2 * s2 * (1.0 - s2)
    epsbar_o = dot(u2bar, w3)                # u2 = eps W3^T -> (B, op)

    # ---- forward-path backward, merged with the probe-path z contributions
    g2 = dot(ybar_t, w3.T) * s2
    z2_t = g2 + z2_b
    h1bar = dot(z2_t, w2.T)
    z1_t = h1bar * s1 + z1_b
    xbar_ref[:] = dot(z1_t, w1.T)

    epsbar = divbar * e_z                                           # (B, ip)
    pad_cols = epsbar.shape[1] - op
    if pad_cols:
        epsbar_o = jnp.pad(epsbar_o, ((0, 0), (0, pad_cols)))
    epsbar_ref[:] = epsbar + epsbar_o

    # ---- parameter gradients, accumulated across batch tiles ----
    @pl.when(pl.program_id(0) == 0)
    def _():
        w1b_ref[:] = jnp.zeros_like(w1b_ref)
        b1b_ref[:] = jnp.zeros_like(b1b_ref)
        w2b_ref[:] = jnp.zeros_like(w2b_ref)
        b2b_ref[:] = jnp.zeros_like(b2b_ref)
        w3b_ref[:] = jnp.zeros_like(w3b_ref)
        b3b_ref[:] = jnp.zeros_like(b3b_ref)

    w1b_ref[:] += dot(x.T, z1_t) + dot(ebar_t.T, d1)
    b1b_ref[:] += jnp.sum(z1_t, axis=0, keepdims=True)
    w2b_ref[:] += dot(h1.T, z2_t) + dot(u1bar.T, d2)
    b2b_ref[:] += jnp.sum(z2_t, axis=0, keepdims=True)
    w3b_ref[:] += dot(h2.T, ybar_t) + dot(u2bar.T, eps[:, :op])
    b3b_ref[:] += jnp.sum(ybar_t, axis=0, keepdims=True)


def _bwd_call(x_p, eps_p, padded, ybar_p, ebar_p, sbar, nz: int, tile_b: int, cdt):
    b, ip = x_p.shape
    w1, b1, w2, b2, w3, b3 = padded
    hp, op = w1.shape[1], w3.shape[1]
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, nz, op, cdt),
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, ip), row, memory_space=pltpu.VMEM),   # x
            pl.BlockSpec((tile_b, ip), row, memory_space=pltpu.VMEM),   # eps
            pl.BlockSpec((ip, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, op), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, op), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, op), row, memory_space=pltpu.VMEM),   # ybar
            pl.BlockSpec((tile_b, ip), row, memory_space=pltpu.VMEM),   # ebar
            pl.BlockSpec((tile_b, LANE), row, memory_space=pltpu.VMEM), # sbar
        ],
        out_specs=[
            pl.BlockSpec((tile_b, ip), row, memory_space=pltpu.VMEM),   # xbar
            pl.BlockSpec((tile_b, ip), row, memory_space=pltpu.VMEM),   # epsbar
            pl.BlockSpec((ip, hp), const, memory_space=pltpu.VMEM),     # w1bar
            pl.BlockSpec((1, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, op), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, op), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ip), jnp.float32),
            jax.ShapeDtypeStruct((b, ip), jnp.float32),
            jax.ShapeDtypeStruct((ip, hp), jnp.float32),
            jax.ShapeDtypeStruct((1, hp), jnp.float32),
            jax.ShapeDtypeStruct((hp, hp), jnp.float32),
            jax.ShapeDtypeStruct((1, hp), jnp.float32),
            jax.ShapeDtypeStruct((hp, op), jnp.float32),
            jax.ShapeDtypeStruct((1, op), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * (2 * ip * hp + 2 * hp * hp + 2 * hp * op),
            bytes_accessed=4 * b * (5 * ip + 2 * op + LANE)
            + 8 * (ip * hp + hp * hp + hp * op),
            transcendentals=4 * b * hp,
        ),
        interpret=_interpret(),
    )(x_p, eps_p, w1, b1, w2, b2, w3, b3, ybar_p, ebar_p, sbar)


# ---------------------------------------------------------------------------
# reference (XLA) implementation + public custom-vjp op
# ---------------------------------------------------------------------------


def mlp3_forward_vjp_reference(x, eps, params, nz: int):
    """Pure-JAX reference of the fused op (unpadded shapes) — fallback path
    and correctness oracle for the kernels."""
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
    reg_z = jnp.sqrt(jnp.sum(y * y, axis=-1) + 1e-20)
    reg_j = jnp.sqrt(jnp.sum(epsj_z * epsj_z, axis=-1) + 1e-20)
    return y, epsj_z, div, reg_z, reg_j


def _tile_for(b: int, tile_b: int) -> Optional[int]:
    tb = min(tile_b, b)
    while tb >= 8:
        if b % tb == 0 and tb % 8 == 0:
            return tb
        tb -= 8
    return None


def _stage_tile(b: int, n_in: int, h: int, requested: int, backward: bool) -> Optional[int]:
    """Largest valid batch tile that keeps the stage kernel inside VMEM.

    Budget model (float32 bytes): weights (and, in the backward, weight-grad
    accumulators) are tile-independent residents; ~14 live (tile, hp)
    intermediates scale with the tile.  Solving for the tile under a 12 MB
    budget lets the backward run up to h = 1024 (tile 64) instead of
    VMEM-OOMing — the round-1 wide-net gap (ROADMAP item 1)."""
    ip, hp = _pad_to(n_in), _pad_to(h)
    weights = 4 * (ip * hp + hp * hp + hp * LANE + 3 * hp)
    resident = weights * (2 if backward else 1)
    budget = 12 * 1024 * 1024 - resident
    if budget <= 0:
        return None
    per_row = 4 * hp * (14 if backward else 10)
    cap = max(8, (budget // per_row) // 8 * 8)
    return _tile_for(b, min(requested, cap))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_dynamics_vjp(x, eps, params, nz: int, tile_b: int = 256, compute_dtype=None):
    """Fused MLP forward + probe VJP + reductions.

    Args:
      x: ``(B, n_in)`` net input (flow state ++ time ++ conditions).
      eps: ``(B, n_out)`` Hutchinson probe (``n_out == nz``).
      params: 3-layer MLP params (list-of-dicts).
      nz: width of the flow-state block at the front of ``x``.
      tile_b: batch rows per Pallas program.
      compute_dtype: ``None`` (float32-accurate MXU) or ``jnp.bfloat16``.

    Returns ``(y, epsj_z, div, reg_z, reg_j)`` with shapes
    ``(B, n_out), (B, nz), (B,), (B,), (B,)``.
    """
    n_in = x.shape[1]
    h = params[0]["w"].shape[1]
    n_out = params[2]["w"].shape[1]
    tb = _stage_tile(x.shape[0], n_in, h, tile_b, backward=False)
    if tb is None:
        return mlp3_forward_vjp_reference(x, eps, params, nz)

    ip = _pad_to(n_in)
    x_p = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, ip - n_in)))
    eps_p = jnp.pad(eps.astype(jnp.float32), ((0, 0), (0, ip - n_out)))
    padded = pad_mlp3_params(params, n_in, h, n_out)

    y_p, epsj_p, stats = _fwd_call(x_p, eps_p, padded, nz, tb, compute_dtype)
    return (
        y_p[:, :n_out],
        epsj_p[:, :nz],
        stats[:, 0],
        stats[:, 1],
        stats[:, 2],
    )


def _fused_fwd(x, eps, params, nz, tile_b, compute_dtype):
    out = fused_dynamics_vjp(x, eps, params, nz, tile_b, compute_dtype)
    return out, (x, eps, params)


def _fused_bwd(nz, tile_b, compute_dtype, residuals, cotangents):
    x, eps, params = residuals
    tb = _stage_tile(x.shape[0], x.shape[1], params[0]["w"].shape[1], tile_b,
                     backward=True)
    if tb is None:
        _, vjp_fn = jax.vjp(
            lambda x_, eps_, p_: mlp3_forward_vjp_reference(x_, eps_, p_, nz),
            x, eps, params,
        )
        return vjp_fn(cotangents)

    ybar, ezbar, divbar, rzbar, rjbar = cotangents
    n_in = x.shape[1]
    h = params[0]["w"].shape[1]
    n_out = params[2]["w"].shape[1]
    ip = _pad_to(n_in)
    op = _pad_to(n_out)
    b = x.shape[0]

    x_p = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, ip - n_in)))
    eps_p = jnp.pad(eps.astype(jnp.float32), ((0, 0), (0, ip - n_out)))
    padded = pad_mlp3_params(params, n_in, h, n_out)
    ybar_p = jnp.pad(ybar.astype(jnp.float32), ((0, 0), (0, op - n_out)))
    ebar_p = jnp.pad(ezbar.astype(jnp.float32), ((0, 0), (0, ip - nz)))
    sbar = (
        jnp.zeros((b, LANE), jnp.float32)
        .at[:, 0].set(divbar.astype(jnp.float32))
        .at[:, 1].set(rzbar.astype(jnp.float32))
        .at[:, 2].set(rjbar.astype(jnp.float32))
    )

    xbar_p, epsbar_p, w1b, b1b, w2b, b2b, w3b, b3b = _bwd_call(
        x_p, eps_p, padded, ybar_p, ebar_p, sbar, nz, tb, compute_dtype
    )
    params_bar = [
        {"w": w1b[:n_in, :h], "b": b1b[0, :h]},
        {"w": w2b[:h, :h], "b": b2b[0, :h]},
        {"w": w3b[:h, :n_out], "b": b3b[0, :n_out]},
    ]
    return (
        xbar_p[:, :n_in].astype(x.dtype),
        epsbar_p[:, :n_out].astype(eps.dtype),
        params_bar,
    )


fused_dynamics_vjp.defvjp(_fused_fwd, _fused_bwd)
