"""Whole-solve Pallas kernels: the entire fixed-step RK4 ODE solve — and its
exact discrete backward — each in a single kernel launch.

Motivation (measured, PARITY.md): for the reference-default dynamics net the
matmuls are 6-24 wide, so XLA's per-stage kernels run the MXU at ~3%
utilization and the train step is dominated by inter-op overhead and HBM
round-trips of the (B, h) activations — 128 dynamics evaluations per RK4-32
solve, each a separate kernel chain.  Padding each stage call (the per-stage
fused kernel) made it *worse* because the lane-padded operands round-trip HBM
per stage.

The whole-solve kernel eliminates all of it: state, probe, weights and the
step loop live in VMEM for the entire solve; HBM sees exactly one read of
``(u0, eps, ys)`` and one write of ``u1`` per batch tile.

Scope (static preconditions, checked by :func:`fused_solve_applicable`):
3-layer softplus MLP dynamics with ``n_in, n_out <= 128`` (state/probe are one
128-lane tile) and hidden width ``h <= 512`` (hidden blocks padded to
multiples of 128; the batch tile shrinks proportionally to keep VMEM bounded),
Hutchinson-VJP estimator, single probe — i.e. the reference-default
configuration family up to tabular-scale nets (BASELINE config 4: 43-d,
h = 176).

Forward kernel
    ``fori_loop`` over ``steps``; each RK4 stage is the fused
    forward-MLP + probe-VJP + reductions chain (see ``pallas_kernels``), and
    the augmented derivative is assembled in-register:
    ``du = y - div*e_nz + reg_z*e_nz1 + reg_j*e_nz2``.

Backward kernel (exact discrete BPTT, not a continuous adjoint)
    Re-runs the forward trajectory for its tile into VMEM scratch
    (``steps x tile x 128``), then walks the RK4 steps backward applying the
    hand-derived stage VJP (second-order sigmoid-gate chain) through the
    classic RK4 chain rule:

        k4b = dt/6 a ;  v3b = f_vjp(t+dt,  v3; k4b)
        k3b = dt/3 a + dt   v3b ;  v2b = f_vjp(t+dt/2, v2; k3b)
        k2b = dt/3 a + dt/2 v2b ;  v1b = f_vjp(t+dt/2, v1; k2b)
        k1b = dt/6 a + dt/2 v1b ;  u0b = f_vjp(t,      u ; k1b)
        a  <- a + v3b + v2b + v1b + u0b

    Parameter and probe cotangents accumulate in VMEM across stages, steps,
    and batch tiles (sequential TPU grid).  Gradients are bit-exact
    discretize-then-optimize — the same semantics as backprop-through-scan.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ICNFConfig, Mode, TraceEstimator

__all__ = ["fused_solve_applicable", "fused_solve_rk4", "fused_solve_tile"]

LANE = 128
F32 = jnp.float32


def _onehot_row(col: int) -> jax.Array:
    c = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    return (c == col).astype(F32)


def _colmask_lt(n: int, shape) -> jax.Array:
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (c < n).astype(F32)


def _make_dot(cdt):
    # cdt=None must be genuinely float32-accurate: Mosaic's default matmul
    # runs bf16 passes even for f32 operands (measured: "f32" kernels matched
    # bf16 kernel speed and numerics), so request HIGHEST explicitly.
    def dot(a, b):
        if cdt is not None:
            a = a.astype(cdt)
            b = b.astype(cdt)
            return jnp.dot(a, b, preferred_element_type=F32)
        return jnp.dot(a, b, preferred_element_type=F32,
                       precision=jax.lax.Precision.HIGHEST)

    return dot


def _stage_fwd(dot, nz: int, t_col: Optional[int], u, eps, ys_pad, t, ws):
    """One dynamics evaluation. ``u, eps, ys_pad``: (tile, 128). Returns
    ``du`` (tile, 128) and the intermediates needed by the stage VJP."""
    w1, b1, w2, b2, w3, b3 = ws
    zin = _colmask_lt(nz, u.shape)
    x = u * zin + ys_pad
    if t_col is not None:
        x = x + t * _onehot_row(t_col)

    z1 = dot(x, w1) + b1
    s1 = jax.nn.sigmoid(z1)
    h1 = jax.nn.softplus(z1)
    z2 = dot(h1, w2) + b2
    s2 = jax.nn.sigmoid(z2)
    h2 = jax.nn.softplus(z2)
    y = dot(h2, w3) + b3                      # cols >= nz are exactly 0
    u2 = dot(eps, w3.T)
    d2 = u2 * s2
    u1 = dot(d2, w2.T)
    d1 = u1 * s1
    e = dot(d1, w1.T)
    e_z = e * zin
    div = jnp.sum(e_z * eps, axis=1, keepdims=True)
    ry = jnp.sqrt(jnp.sum(y * y, axis=1, keepdims=True) + 1e-20)
    re = jnp.sqrt(jnp.sum(e_z * e_z, axis=1, keepdims=True) + 1e-20)

    du = (
        y
        - div * _onehot_row(nz)
        + ry * _onehot_row(nz + 1)
        + re * _onehot_row(nz + 2)
    )
    inter = (x, z1, s1, h1, z2, s2, h2, y, u2, d2, u1, d1, e_z, ry, re)
    return du, inter


def _stage_vjp(dot, nz: int, dubar, eps, ws, inter):
    """Cotangent of one stage: given ``dubar`` on ``du``, returns
    ``(ubar, epsbar, wbars)`` — the hand-derived chain from
    ``pallas_kernels._bwd_kernel``, with the du-assembly unpacked first."""
    w1, b1, w2, b2, w3, b3 = ws
    (x, z1, s1, h1, z2, s2, h2, y, u2, d2, u1, d1, e_z, ry, re) = inter
    zin = _colmask_lt(nz, dubar.shape)

    ybar = dubar * zin                       # y occupies cols < nz
    divbar = -jnp.sum(dubar * _onehot_row(nz), axis=1, keepdims=True)
    rzbar = jnp.sum(dubar * _onehot_row(nz + 1), axis=1, keepdims=True)
    rjbar = jnp.sum(dubar * _onehot_row(nz + 2), axis=1, keepdims=True)

    ybar_t = ybar + rzbar * y / ry
    ebar_t = (divbar * eps + rjbar * e_z / re) * zin

    # probe-VJP path (second-order)
    d1bar = dot(ebar_t, w1)
    u1bar = d1bar * s1
    z1_b = d1bar * u1 * s1 * (1.0 - s1)
    d2bar = dot(u1bar, w2)
    u2bar = d2bar * s2
    z2_b = d2bar * u2 * s2 * (1.0 - s2)
    epsbar = divbar * e_z + dot(u2bar, w3)

    # forward path
    g2 = dot(ybar_t, w3.T) * s2
    z2_t = g2 + z2_b
    h1bar = dot(z2_t, w2.T)
    z1_t = h1bar * s1 + z1_b
    xbar = dot(z1_t, w1.T)
    ubar = xbar * zin

    wbars = (
        dot(x.T, z1_t) + dot(ebar_t.T, d1),       # w1
        jnp.sum(z1_t, axis=0, keepdims=True),      # b1
        dot(h1.T, z2_t) + dot(u1bar.T, d2),        # w2
        jnp.sum(z2_t, axis=0, keepdims=True),      # b2
        dot(h2.T, ybar_t) + dot(u2bar.T, eps),     # w3
        jnp.sum(ybar_t, axis=0, keepdims=True),    # b3
    )
    return ubar, epsbar, wbars


# ---------------------------------------------------------------------------
# forward solve kernel
# ---------------------------------------------------------------------------


def _solve_fwd_kernel(nz, t_col, steps, cdt, t0_ref, dt_ref, u0_ref, eps_ref,
                      ys_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                      u1_ref):
    dot = _make_dot(cdt)
    ws = (w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:])
    eps = eps_ref[:]
    ys = ys_ref[:]
    t0 = t0_ref[0, 0]
    dt = dt_ref[0, 0]

    def stage(t, u):
        du, _ = _stage_fwd(dot, nz, t_col, u, eps, ys, t, ws)
        return du

    def body(i, u):
        t = t0 + i.astype(F32) * dt
        k1 = stage(t, u)
        k2 = stage(t + 0.5 * dt, u + 0.5 * dt * k1)
        k3 = stage(t + 0.5 * dt, u + 0.5 * dt * k2)
        k4 = stage(t + dt, u + dt * k3)
        return u + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    u1_ref[:] = jax.lax.fori_loop(0, steps, body, u0_ref[:])


# ---------------------------------------------------------------------------
# backward solve kernel (exact discrete BPTT with trajectory recompute)
# ---------------------------------------------------------------------------


def _solve_bwd_kernel(nz, t_col, steps, cdt, t0_ref, dt_ref, u0_ref, eps_ref,
                      ys_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                      gbar_ref, u0bar_ref, epsbar_ref, w1b_ref, b1b_ref,
                      w2b_ref, b2b_ref, w3b_ref, b3b_ref, traj_ref):
    dot = _make_dot(cdt)
    ws = (w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:])
    eps = eps_ref[:]
    ys = ys_ref[:]
    t0 = t0_ref[0, 0]
    dt = dt_ref[0, 0]

    def stage(t, u):
        return _stage_fwd(dot, nz, t_col, u, eps, ys, t, ws)

    # ---- 1. recompute and stash the step trajectory u_0 .. u_{steps-1} ----
    def fwd_body(i, u):
        traj_ref[i] = u
        t = t0 + i.astype(F32) * dt
        k1, _ = stage(t, u)
        k2, _ = stage(t + 0.5 * dt, u + 0.5 * dt * k1)
        k3, _ = stage(t + 0.5 * dt, u + 0.5 * dt * k2)
        k4, _ = stage(t + dt, u + dt * k3)
        return u + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    jax.lax.fori_loop(0, steps, fwd_body, u0_ref[:])

    # ---- 2. zero-init cross-tile parameter accumulators ----
    @pl.when(pl.program_id(0) == 0)
    def _():
        w1b_ref[:] = jnp.zeros_like(w1b_ref)
        b1b_ref[:] = jnp.zeros_like(b1b_ref)
        w2b_ref[:] = jnp.zeros_like(w2b_ref)
        b2b_ref[:] = jnp.zeros_like(b2b_ref)
        w3b_ref[:] = jnp.zeros_like(w3b_ref)
        b3b_ref[:] = jnp.zeros_like(b3b_ref)

    zero_w = tuple(
        jnp.zeros_like(r) for r in (w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:])
    )

    # ---- 3. walk the steps backward with the RK4 chain rule ----
    def bwd_body(j, carry):
        a, ebar, wb = carry
        n = steps - 1 - j
        u = traj_ref[n]
        t = t0 + n.astype(F32) * dt

        k1, i1 = stage(t, u)
        v1 = u + 0.5 * dt * k1
        k2, i2 = stage(t + 0.5 * dt, v1)
        v2 = u + 0.5 * dt * k2
        k3, i3 = stage(t + 0.5 * dt, v2)
        v3 = u + dt * k3

        _k4, i4 = stage(t + dt, v3)

        k4b = (dt / 6.0) * a
        v3b, e4, w4 = _stage_vjp(dot, nz, k4b, eps, ws, i4)
        k3b = (dt / 3.0) * a + dt * v3b
        v2b, e3, w3_ = _stage_vjp(dot, nz, k3b, eps, ws, i3)
        k2b = (dt / 3.0) * a + 0.5 * dt * v2b
        v1b, e2, w2_ = _stage_vjp(dot, nz, k2b, eps, ws, i2)
        k1b = (dt / 6.0) * a + 0.5 * dt * v1b
        u0b, e1, w1_ = _stage_vjp(dot, nz, k1b, eps, ws, i1)

        a_new = a + v3b + v2b + v1b + u0b
        ebar_new = ebar + e1 + e2 + e3 + e4
        wb_new = tuple(
            acc + c4 + c3 + c2 + c1
            for acc, c4, c3, c2, c1 in zip(wb, w4, w3_, w2_, w1_)
        )
        return a_new, ebar_new, wb_new

    a0, ebar, wb = jax.lax.fori_loop(
        0, steps, bwd_body, (gbar_ref[:], jnp.zeros_like(eps), zero_w)
    )
    u0bar_ref[:] = a0
    epsbar_ref[:] = ebar
    w1b_ref[:] += wb[0]
    b1b_ref[:] += wb[1]
    w2b_ref[:] += wb[2]
    b2b_ref[:] += wb[3]
    w3b_ref[:] += wb[4]
    b3b_ref[:] += wb[5]


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def fused_solve_applicable(cfg: ICNFConfig, net, mode: Mode) -> bool:
    """Static preconditions for the whole-solve kernel.

    Requires the regularized train mode with both RNODE norms active: the
    kernel always integrates the E/n accumulators, and the reference zeroes
    them when the corresponding flag is off (icnf.jl:180-251), so applying it
    to flagless configs would change the returned (E, n) values.  Gradient
    semantics are exact-discrete, i.e. the ``backprop`` mode.

    SolverConfig coverage: ``fixed_steps`` is honored (the only field with
    meaning for a fixed-step solve); ``method='rk4'`` + ``gradient='backprop'``
    are required by the gate.  ``remat`` is N/A — the kernel's memory plan
    (recompute stages in the backward, states in VMEM) replaces the scan-level
    checkpointing choice.  All adaptive-controller fields (rtol/atol/dt0/
    safety/min_factor/max_factor/max_steps/dense_max_nodes/adjoint_seminorm/
    abm_order) are N/A by construction — nothing is silently dropped.

    Exclusions vs the other measured wins (docs/perf.md "What composes"):
    the ``nprobes == 1`` condition means the fused kernel CANNOT be combined
    with the measured nprobes=4 variance-per-wall-clock optimum (the kernel's
    probe ride-along has a single probe lane); a config with ``fused=True``
    and ``nprobes > 1`` silently takes the XLA path — by design, the gate is
    an applicability predicate, not a validator."""
    from ..models.nets import MLP

    return (
        cfg.fused
        and cfg.layout == "batch_first"
        and cfg.solver.method == "rk4"
        and cfg.solver.gradient == "backprop"
        and mode is Mode.TRAIN
        and cfg.norm_z
        and cfg.norm_j
        and cfg.trace_for(mode) is TraceEstimator.HUTCH_VJP
        and cfg.nprobes == 1
        and isinstance(net, MLP)
        and len(net.widths) == 4
        and net.widths[1] == net.widths[2]
        and net.widths[1] <= 4 * LANE  # hidden dim blocked in 128-lane tiles
        and net.activation is jax.nn.softplus
        and cfg.n_in <= LANE
        and cfg.state_dim <= LANE
        and jax.default_backend() == "tpu"
    )


def _pad128(n: int) -> int:
    return ((n + LANE - 1) // LANE) * LANE


def _pack_params(params, n_in: int, h: int, n_out: int):
    """Zero-pad: input/state/output widths to one 128-lane tile (applicability
    requires them <= 128), the hidden width to a multiple of 128 (up to 4
    tiles — zero-padded hidden units have zero outgoing weights, so padding is
    exact everywhere including the backward)."""
    hp = _pad128(h)
    w1 = jnp.zeros((LANE, hp), F32).at[:n_in, :h].set(params[0]["w"])
    b1 = jnp.zeros((1, hp), F32).at[0, :h].set(params[0]["b"])
    w2 = jnp.zeros((hp, hp), F32).at[:h, :h].set(params[1]["w"])
    b2 = jnp.zeros((1, hp), F32).at[0, :h].set(params[1]["b"])
    w3 = jnp.zeros((hp, LANE), F32).at[:h, :n_out].set(params[2]["w"])
    b3 = jnp.zeros((1, LANE), F32).at[0, :n_out].set(params[2]["b"])
    return (w1, b1, w2, b2, w3, b3)


def _specs(tile_b, hp: int = LANE):
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    smem = pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM)
    vrow = pl.BlockSpec((tile_b, LANE), row, memory_space=pltpu.VMEM)
    vconst = pl.BlockSpec((LANE, LANE), const, memory_space=pltpu.VMEM)
    vbias = pl.BlockSpec((1, LANE), const, memory_space=pltpu.VMEM)
    # per-weight specs matching the packed shapes (w1, b1, w2, b2, w3, b3)
    wspecs = [
        pl.BlockSpec((LANE, hp), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hp), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((hp, hp), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hp), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((hp, LANE), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANE), const, memory_space=pltpu.VMEM),
    ]
    return smem, vrow, vconst, vbias, wspecs


def _tile_for(b: int, requested: int) -> Optional[int]:
    tb = min(requested, b)
    if b % tb == 0 and tb % 8 == 0:
        return tb
    return None


def fused_solve_tile(batch: int, hidden: int, requested: int = 256) -> Optional[int]:
    """The batch tile the kernels will actually use, or ``None`` if no valid
    tiling exists.  Applies the hidden-width VMEM shrink *before* the
    divisibility check, so gating on this function and the tile chosen inside
    ``_prep`` can never disagree (a ``h > 128`` net shrinks the tile; e.g.
    h=176 with batch 144 tiles at 128 → invalid → fall back to XLA)."""
    if hidden > LANE:
        requested = min(requested, max(8, (requested * LANE) // _pad128(hidden)))
    return _tile_for(batch, requested)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_solve_rk4(u0, eps, ys_pad, params, tspan, nz: int, t_col, steps: int,
                    tile_b: int = 256, compute_dtype=None):
    """Whole-solve forward. ``u0``: (B, state_dim); ``eps``: (B, nz);
    ``ys_pad``: (B, nconditions) conditions or None; ``tspan = (t0, t1)``
    traced scalars. Returns ``u1`` (B, state_dim)."""
    out, _ = _fused_solve_fwd(u0, eps, ys_pad, params, tspan, nz, t_col, steps,
                              tile_b, compute_dtype)
    return out


def _prep(u0, eps, ys_pad, params, tspan, nz, t_col, steps, tile_b):
    b, sd = u0.shape
    n_in = params[0]["w"].shape[0]
    h = params[0]["w"].shape[1]
    n_out = params[2]["w"].shape[1]
    # wider hidden tiles hold ~hp/LANE x the per-stage intermediates in VMEM;
    # shrink the batch tile to compensate (shared with the applicability gate
    # via fused_solve_tile so gate and kernel can never disagree)
    tb = fused_solve_tile(b, h, tile_b)
    u0_p = jnp.pad(u0.astype(F32), ((0, 0), (0, LANE - sd)))
    eps_p = jnp.pad(eps.astype(F32), ((0, 0), (0, LANE - eps.shape[1])))
    if ys_pad is not None:
        off = nz + (1 if t_col is not None else 0)
        ys_full = jnp.zeros((b, LANE), F32).at[:, off : off + ys_pad.shape[1]].set(
            ys_pad.astype(F32)
        )
    else:
        ys_full = jnp.zeros((b, LANE), F32)
    packed = _pack_params(params, n_in, h, n_out)
    t0, t1 = tspan
    t0a = jnp.asarray(t0, F32).reshape(1, 1)
    dt = (jnp.asarray(t1, F32) - jnp.asarray(t0, F32)).reshape(1, 1) / steps
    return b, sd, n_in, h, n_out, tb, u0_p, eps_p, ys_full, packed, t0a, dt


def _fused_solve_fwd(u0, eps, ys_pad, params, tspan, nz, t_col, steps, tile_b,
                     compute_dtype):
    (b, sd, n_in, h, n_out, tb, u0_p, eps_p, ys_full, packed, t0a, dt) = _prep(
        u0, eps, ys_pad, params, tspan, nz, t_col, steps, tile_b
    )
    assert tb is not None, "caller must check fused-solve applicability"
    hp = packed[0].shape[1]
    smem, vrow, vconst, vbias, wspecs = _specs(tb, hp)

    u1_p = pl.pallas_call(
        functools.partial(_solve_fwd_kernel, nz, t_col, steps, compute_dtype),
        grid=(b // tb,),
        in_specs=[smem, smem, vrow, vrow, vrow, *wspecs],
        out_specs=vrow,
        out_shape=jax.ShapeDtypeStruct((b, LANE), F32),
        cost_estimate=pl.CostEstimate(
            flops=steps * 4 * 12 * b * LANE * hp,
            bytes_accessed=4 * b * 4 * LANE,
            transcendentals=steps * 16 * b * hp,
        ),
        interpret=jax.default_backend() != "tpu",
    )(t0a, dt, u0_p, eps_p, ys_full, *packed)
    u1 = u1_p[:, :sd]
    return u1, (u0, eps, ys_pad, params, tspan)


def _fused_solve_bwd(nz, t_col, steps, tile_b, compute_dtype, residuals, g):
    u0, eps, ys_pad, params, tspan = residuals
    (b, sd, n_in, h, n_out, tb, u0_p, eps_p, ys_full, packed, t0a, dt) = _prep(
        u0, eps, ys_pad, params, tspan, nz, t_col, steps, tile_b
    )
    hp = packed[0].shape[1]
    smem, vrow, vconst, vbias, wspecs = _specs(tb, hp)
    g_p = jnp.pad(g.astype(F32), ((0, 0), (0, LANE - sd)))

    outs = pl.pallas_call(
        functools.partial(_solve_bwd_kernel, nz, t_col, steps, compute_dtype),
        grid=(b // tb,),
        in_specs=[smem, smem, vrow, vrow, vrow, *wspecs, vrow],
        out_specs=[vrow, vrow, *wspecs],
        out_shape=[
            jax.ShapeDtypeStruct((b, LANE), F32),
            jax.ShapeDtypeStruct((b, LANE), F32),
            jax.ShapeDtypeStruct((LANE, hp), F32),
            jax.ShapeDtypeStruct((1, hp), F32),
            jax.ShapeDtypeStruct((hp, hp), F32),
            jax.ShapeDtypeStruct((1, hp), F32),
            jax.ShapeDtypeStruct((hp, LANE), F32),
            jax.ShapeDtypeStruct((1, LANE), F32),
        ],
        scratch_shapes=[pltpu.VMEM((steps, tb, LANE), F32)],
        cost_estimate=pl.CostEstimate(
            flops=steps * 4 * 40 * b * LANE * hp,
            bytes_accessed=4 * b * 6 * LANE,
            transcendentals=steps * 60 * b * hp,
        ),
        interpret=jax.default_backend() != "tpu",
    )(t0a, dt, u0_p, eps_p, ys_full, *packed, g_p)

    u0bar_p, epsbar_p, w1b, b1b, w2b, b2b, w3b, b3b = outs
    params_bar = [
        {"w": w1b[:n_in, :h], "b": b1b[0, :h]},
        {"w": w2b[:h, :h], "b": b2b[0, :h]},
        {"w": w3b[:h, :n_out], "b": b3b[0, :n_out]},
    ]
    ysbar = None
    if ys_pad is not None:
        # conditions enter every stage input like z does; their cotangent is
        # not tracked in-kernel (rare need) — return zeros to keep the vjp
        # structure total.
        ysbar = jnp.zeros_like(ys_pad)
    # tspan cotangents: not tracked (STEER's t1 is not differentiated through
    # in the reference either) — zeros of the right structure.
    t0, t1 = tspan
    tbar = (jnp.zeros_like(jnp.asarray(t0, F32)), jnp.zeros_like(jnp.asarray(t1, F32)))
    return (
        u0bar_p[:, :sd].astype(u0.dtype),
        epsbar_p[:, : eps.shape[1]].astype(eps.dtype),
        ysbar,
        params_bar,
        tbar,
    )


def _fused_solve_fwd_rule(u0, eps, ys_pad, params, tspan, nz, t_col, steps,
                          tile_b, compute_dtype):
    return _fused_solve_fwd(u0, eps, ys_pad, params, tspan, nz, t_col, steps,
                            tile_b, compute_dtype)


fused_solve_rk4.defvjp(_fused_solve_fwd_rule, _fused_solve_bwd)
