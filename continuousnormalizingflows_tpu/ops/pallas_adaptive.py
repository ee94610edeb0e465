"""Adaptive whole-solve Pallas kernel: the entire dopri5 solve — including the
step-size controller — and its exact discrete backward, each in one kernel.

This extends the fixed-step whole-solve kernel (:mod:`pallas_solve`) to the
adaptive TRAIN path, the configuration the reference actually ships as its
default (adaptive solve at ``reltol = abstol = 1e-4`` + sensitivity gradients,
reference ``src/core/icnf.jl:84-102``).  Motivation (measured, PARITY.md): at
h≈128 dynamics widths the fixed-step kernel beats fp32 XLA 2.3x because the
whole solve lives in VMEM; the adaptive XLA path additionally pays one kernel
chain per *trial* step plus the backsolve adjoint's backward integration.

Design — per-tile step control
    Each batch tile runs its **own** ``lax.while_loop`` with the embedded
    Dormand-Prince 5(4) error estimate and the same controller formula as
    :func:`ops.ode.odeint_dopri5`, but the error norm is reduced over the
    *tile*, not the global batch.  This intentionally diverges from the XLA
    path's single global norm (SURVEY.md §5 collective-consistent stepping —
    a single kernel launch has no cross-tile communication): every tile still
    satisfies the local error tolerance, and tiles without the worst-case
    sample take *fewer* steps than the global controller would force on them,
    so per-tile adaptivity is an NFE reduction, not just a fusion win.
    Parity is therefore distributional (all results within tolerance of the
    XLA solve), not bitwise — asserted in tests/test_pallas_adaptive.py.

Backward (exact discrete BPTT over the accepted-step sequence)
    The backward kernel replays the adaptive forward for its tile, recording
    each accepted step's start state / t / dt into VMEM/SMEM scratch
    (``max_nodes`` capacity), then walks the accepted steps in reverse
    applying the hand-derived stage VJP through the full 6-stage dopri5 chain
    rule (cotangents: ``kbar_i = dt*b_i*a + dt*sum_{m>i} a_mi*vbar_m``).  The
    accept/reject decisions and step sizes are treated as non-differentiable
    (the standard discretize-then-optimize convention for adaptive solvers —
    the controller's dependence on parameters is dropped, exactly as the
    reference's sensitivity algorithms do by solving a separate adjoint ODE).
    Gradients are exact for the computed discrete solution with the step
    sequence frozen; they agree with the continuous adjoint to O(tol).

Loud-failure policy (matching ops.ode): a tile that exhausts ``max_steps``
NaN-poisons its rows; a backward replay that accepts more steps than
``max_nodes`` NaN-poisons the gradients (never silently truncates).  Sizing
rule: ``max_nodes >= expected accepted steps`` (4-40 at rtol 1e-4).
``core._solve`` passes ``min(SolverConfig.dense_max_nodes,
MAX_NODES_VMEM_CAP)``: the node buffer is honored *downward* (a user
bounding interpolant memory bounds this buffer identically) but capped at
the measured VMEM ceiling — at the 128-row backward tile a
(nodes, 128, 128) f32 buffer of 128 nodes is 8 MiB and overflows the
16 MiB scoped-vmem limit by 1.97 MiB on v5e (compile-time OOM, measured
round 4); 64 nodes (4 MiB) fits alongside the 6 stages of intermediates.

Scope (``fused_adaptive_applicable``): the fixed-kernel family restricted to
hidden width <= 128 (one lane tile — the adaptive backward keeps 6 stages of
intermediates plus the node buffer resident in VMEM), Hutchinson-VJP single
probe, regularized train mode, ``method='dopri5'``.  Stage math runs at
float32-HIGHEST regardless of the net's precision setting: bf16 stage error
(~1e-2, PARITY.md) is larger than the 1e-4 tolerance being controlled, so a
bf16 adaptive kernel would control noise, not truncation error.

SolverConfig coverage (the full-field contract — nothing is dropped
silently; tests/test_pallas_adaptive.py pins the mapped field):

* **honored**: ``rtol``, ``atol``, ``safety``, ``min_factor``,
  ``max_factor``, ``max_steps``, float ``dt0`` (fixed span-fraction start),
  ``dense_max_nodes`` (reused as the backward node-buffer capacity
  ``max_nodes`` — same sizing rule: >= accepted steps; honored downward,
  capped at ``MAX_NODES_VMEM_CAP`` = 64 by core._solve — the measured
  scoped-VMEM ceiling, see the loud-failure paragraph).
* **mapped**: ``dt0="auto"`` → the fixed ``0.01`` start (``_scfg_tuple``).
  The per-tile controller has no HNW starting-step pass (it would cost a
  cross-tile reduction the single kernel launch cannot do), so the
  accepted-step sequence diverges from the XLA path's by the ~1-3 ramp
  steps the auto start saves; results still satisfy the tolerance.
  Bit-close parity with the XLA path therefore requires a float ``dt0``.
* **not applicable by construction**: ``gradient`` (the kernel *is* the
  gradient — exact discrete BPTT; the gate requires ``"adjoint"`` purely to
  mark which XLA path it substitutes for), ``adjoint_seminorm`` (no
  continuous adjoint exists), ``remat`` / ``fixed_steps`` / ``abm_order``
  (no scan / multistep machinery).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import (DEFAULT_FIXED_DT0, ICNFConfig, Mode, SolverConfig,
                      TraceEstimator)
from .ode import DOPRI5, SolverStats, _DT_GIVE_UP
from .pallas_solve import (
    LANE,
    F32,
    _colmask_lt,
    _make_dot,
    _onehot_row,
    _pack_params,
    _specs,
    _stage_fwd,
    _stage_vjp,
    _tile_for,
)

__all__ = [
    "MAX_NODES_VMEM_CAP",
    "fused_adaptive_applicable",
    "fused_adaptive_tile",
    "fused_solve_dopri5",
    "stats_from_rows",
]

# VMEM ceiling for the backward node buffer (see module docstring: 128 nodes
# x 128-row tile x 128 lanes f32 = 8 MiB overflows the 16 MiB scoped-vmem
# limit on v5e; 64 fits).  core._solve caps dense_max_nodes here.
MAX_NODES_VMEM_CAP = 64

_A = DOPRI5.A
_B = DOPRI5.B
_BERR = DOPRI5.BERR
_C = DOPRI5.C
_INV_ORDER = 1.0 / DOPRI5.order
_N_STAGES = len(_B)  # 6 solution stages; stage 7 (FSAL) feeds error + next k1


def _trial_step(fstage, t, u, dt_c, k1):
    """One embedded dopri5 trial: returns ``(u5, err, k7)``.  Static unroll —
    the tableau constants fold into the kernel."""
    ks = [k1]
    for i, row in enumerate(_A):
        vi = u
        for c, k in zip(row, ks):
            if c != 0.0:
                vi = vi + dt_c * c * k
        ks.append(fstage(t + _C[i + 1] * dt_c, vi))
    u5 = u
    for c, k in zip(_B, ks):
        if c != 0.0:
            u5 = u5 + dt_c * c * k
    k7 = fstage(t + dt_c, u5)
    ks.append(k7)
    err = dt_c * _BERR[0] * ks[0]
    for c, k in zip(_BERR[1:], ks[1:]):
        if c != 0.0:
            err = err + dt_c * c * k
    return u5, err, k7


def _tile_error_ratio(err, u, u5, sd: int, rtol: float, atol: float):
    """RMS of err / (atol + rtol*max(|u|,|u5|)) over the tile's active
    columns — the per-tile analogue of ops.ode._rms_error_ratio."""
    mask = _colmask_lt(sd, err.shape)
    scale = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(u5))
    r = err / scale * mask
    return jnp.sqrt(jnp.sum(r * r) / (err.shape[0] * sd))


def _controller(ratio, dt_c, safety, min_factor, max_factor):
    """Non-finite-safe step controller (same policy as ops.ode
    ``_controller_factor``): a NaN/Inf error ratio — an overflowed trial step
    — is a hard reject with maximal shrink, never fed to exp/log (a NaN dt
    spins the tile's whole step budget; measured as the 16k-iteration stall
    that watchdog-faulted the kernel on v5e).  Returns ``(finite, dt_next)``.

    ratio**(-1/order) via exp/log: Mosaic has no scalar powf lowering."""
    finite = jnp.isfinite(ratio)
    r = jnp.maximum(jnp.where(finite, ratio, 1.0), 1e-10)
    factor = jnp.clip(
        safety * jnp.exp(-_INV_ORDER * jnp.log(r)),
        min_factor,
        max_factor,
    )
    return finite, dt_c * jnp.where(finite, factor, min_factor)


# the give-up threshold is imported from ops.ode (_DT_GIVE_UP) so the XLA
# and Pallas failure policies can never drift apart


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _adaptive_fwd_kernel(nz, sd, t_col, scfg, t0_ref, t1_ref, u0_ref, eps_ref,
                         ys_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                         b3_ref, u1_ref, stats_ref):
    rtol, atol, dt0f, safety, min_f, max_f, max_steps = scfg
    dot = _make_dot(None)  # f32-HIGHEST stages: see module docstring
    ws = (w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:])
    eps = eps_ref[:]
    ys = ys_ref[:]
    t0 = t0_ref[0, 0]
    t1 = t1_ref[0, 0]
    span = t1 - t0
    direction = jnp.sign(span)
    tiny = jnp.float32(1e-12)

    def fstage(t, u):
        du, _ = _stage_fwd(dot, nz, t_col, u, eps, ys, t, ws)
        return du

    def cond(state):
        t, _u, _dt, _k1, _nfe, steps, _nacc, done, fail = state
        return jnp.logical_and(
            jnp.logical_not(jnp.logical_or(done, fail)), steps < max_steps
        )

    def body(state):
        t, u, dt, k1, nfe, steps, nacc, _done, _fail = state
        remaining = t1 - t
        dt_c = direction * jnp.minimum(jnp.abs(dt), jnp.abs(remaining))
        u5, err, k7 = _trial_step(fstage, t, u, dt_c, k1)
        ratio = _tile_error_ratio(err, u, u5, sd, rtol, atol)
        finite, dt_next = _controller(ratio, dt_c, safety, min_f, max_f)
        accept = jnp.logical_and(finite, ratio <= 1.0)
        t_new = jnp.where(accept, t + dt_c, t)
        u_new = jnp.where(accept, u5, u)
        k_new = jnp.where(accept, k7, k1)
        done = jnp.logical_and(
            accept,
            jnp.abs(t1 - t_new) <= tiny * jnp.maximum(jnp.abs(t1), 1.0),
        )
        fail = jnp.logical_and(
            jnp.logical_not(finite),
            jnp.abs(dt_c) <= _DT_GIVE_UP * jnp.abs(span),
        )
        return (t_new, u_new, dt_next, k_new, nfe + _N_STAGES, steps + 1,
                nacc + accept.astype(jnp.int32), done, fail)

    u0 = u0_ref[:]
    k1 = fstage(t0, u0)
    state0 = (t0, u0, span * jnp.float32(dt0f), k1, jnp.int32(1),
              jnp.int32(0), jnp.int32(0), jnp.bool_(False), jnp.bool_(False))
    _t, u1, dt_f, _k, nfe, steps, nacc, done, _fail = jax.lax.while_loop(
        cond, body, state0
    )
    # loud failure on step-budget exhaustion (same policy as ops.ode)
    u1_ref[:] = jnp.where(done, u1, jnp.float32(jnp.nan))
    # the stats array is one whole-array block (Mosaic: a (1, 128) row block
    # is not a legal tiling) — each grid step writes its own row
    row = (
        nfe.astype(F32) * _onehot_row(0)
        + nacc.astype(F32) * _onehot_row(1)
        + (steps - nacc).astype(F32) * _onehot_row(2)
        + dt_f * _onehot_row(3)
    )
    stats_ref[pl.ds(pl.program_id(0), 1), :] = row


# ---------------------------------------------------------------------------
# backward kernel: adaptive replay + reverse walk of the accepted steps
# ---------------------------------------------------------------------------


def _adaptive_bwd_kernel(nz, sd, t_col, scfg, max_nodes, t0_ref, t1_ref,
                         u0_ref, eps_ref, ys_ref, w1_ref, b1_ref, w2_ref,
                         b2_ref, w3_ref, b3_ref, gbar_ref, u0bar_ref,
                         epsbar_ref, w1b_ref, b1b_ref, w2b_ref, b2b_ref,
                         w3b_ref, b3b_ref, traj_ref, ts_ref, dts_ref):
    rtol, atol, dt0f, safety, min_f, max_f, max_steps = scfg
    dot = _make_dot(None)
    ws = (w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:])
    eps = eps_ref[:]
    ys = ys_ref[:]
    t0 = t0_ref[0, 0]
    t1 = t1_ref[0, 0]
    span = t1 - t0
    direction = jnp.sign(span)
    tiny = jnp.float32(1e-12)

    def fstage(t, u):
        du, _ = _stage_fwd(dot, nz, t_col, u, eps, ys, t, ws)
        return du

    # ---- 1. replay the adaptive forward, recording accepted-step nodes ----
    def cond(state):
        t, _u, _dt, _k1, steps, _n, done, fail = state
        return jnp.logical_and(
            jnp.logical_not(jnp.logical_or(done, fail)), steps < max_steps
        )

    def body(state):
        t, u, dt, k1, steps, n, _done, _fail = state
        remaining = t1 - t
        dt_c = direction * jnp.minimum(jnp.abs(dt), jnp.abs(remaining))
        u5, err, k7 = _trial_step(fstage, t, u, dt_c, k1)
        ratio = _tile_error_ratio(err, u, u5, sd, rtol, atol)
        finite, dt_next = _controller(ratio, dt_c, safety, min_f, max_f)
        accept = jnp.logical_and(finite, ratio <= 1.0)

        @pl.when(accept)
        def _():
            idx = jnp.minimum(n, max_nodes - 1)
            traj_ref[idx] = u
            ts_ref[idx] = t
            dts_ref[idx] = dt_c

        t_new = jnp.where(accept, t + dt_c, t)
        u_new = jnp.where(accept, u5, u)
        k_new = jnp.where(accept, k7, k1)
        done = jnp.logical_and(
            accept,
            jnp.abs(t1 - t_new) <= tiny * jnp.maximum(jnp.abs(t1), 1.0),
        )
        fail = jnp.logical_and(
            jnp.logical_not(finite),
            jnp.abs(dt_c) <= _DT_GIVE_UP * jnp.abs(span),
        )
        return (t_new, u_new, dt_next, k_new, steps + 1,
                n + accept.astype(jnp.int32), done, fail)

    u0 = u0_ref[:]
    k1 = fstage(t0, u0)
    state0 = (t0, u0, span * jnp.float32(dt0f), k1, jnp.int32(0),
              jnp.int32(0), jnp.bool_(False), jnp.bool_(False))
    _t, _u, _dt, _k, _steps, nacc, done, _fail = jax.lax.while_loop(
        cond, body, state0
    )
    # node-buffer overflow or budget exhaustion ⇒ NaN-poisoned gradients
    ok = jnp.logical_and(done, nacc <= max_nodes)
    poison = jnp.where(ok, jnp.float32(1.0), jnp.float32(jnp.nan))

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
        jnp.zeros_like(r)
        for r in (w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], w3_ref[:], b3_ref[:])
    )

    # ---- 3. reverse walk with the dopri5 chain rule ----
    def stage(t, u):
        return _stage_fwd(dot, nz, t_col, u, eps, ys, t, ws)

    def bwd_body(j, carry):
        a, ebar, wb = carry
        n = nacc - 1 - j
        n_c = jnp.clip(n, 0, max_nodes - 1)
        u = traj_ref[n_c]
        t = ts_ref[n_c]
        dt = dts_ref[n_c]

        # recompute the 6 solution stages with VJP intermediates
        ks = []
        inters = []
        vi = u
        du, it = stage(t, vi)
        ks.append(du)
        inters.append(it)
        for i, row in enumerate(_A):
            vi = u
            for c, k in zip(row, ks):
                if c != 0.0:
                    vi = vi + dt * c * k
            du, it = stage(t + _C[i + 1] * dt, vi)
            ks.append(du)
            inters.append(it)

        # cotangents, reverse stage order: kbar_i = dt*b_i*a + dt*Σ_{m>i} a_mi*vbar_m
        vbars = [None] * _N_STAGES
        ebar_step = jnp.zeros_like(eps)
        wb_step = zero_w
        for i in range(_N_STAGES - 1, -1, -1):
            kbar = (dt * _B[i]) * a if _B[i] != 0.0 else jnp.zeros_like(a)
            for m in range(i + 1, _N_STAGES):
                a_mi = _A[m - 1][i]
                if a_mi != 0.0:
                    kbar = kbar + (dt * a_mi) * vbars[m]
            vb, e_i, w_i = _stage_vjp(dot, nz, kbar, eps, ws, inters[i])
            vbars[i] = vb
            ebar_step = ebar_step + e_i
            wb_step = tuple(acc + c for acc, c in zip(wb_step, w_i))

        a_new = a
        for vb in vbars:
            a_new = a_new + vb
        return (a_new, ebar + ebar_step,
                tuple(acc + c for acc, c in zip(wb, wb_step)))

    a0, ebar, wb = jax.lax.fori_loop(
        0, nacc, bwd_body, (gbar_ref[:], jnp.zeros_like(eps), zero_w)
    )
    u0bar_ref[:] = a0 * poison
    epsbar_ref[:] = ebar * poison
    w1b_ref[:] += wb[0] * poison
    b1b_ref[:] += wb[1] * poison
    w2b_ref[:] += wb[2] * poison
    b2b_ref[:] += wb[3] * poison
    w3b_ref[:] += wb[4] * poison
    b3b_ref[:] += wb[5] * poison


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def fused_adaptive_applicable(cfg: ICNFConfig, net, mode: Mode) -> bool:
    """Static preconditions for the adaptive whole-solve kernel: the fixed
    kernel's family (regularized Hutchinson-VJP train mode, 3-layer softplus
    MLP) restricted to hidden width <= 128 (VMEM: 6 stages of intermediates +
    the node buffer stay resident), with ``method='dopri5'`` and the
    continuous-adjoint gradient setting (which the kernel replaces with exact
    discrete BPTT over the frozen accepted-step sequence).

    Exclusions vs the other measured wins (docs/perf.md "What composes"):
    ``nprobes == 1`` is required (no fused path composes with the measured
    nprobes=4 optimum), and ``dt0="auto"``/``"carry"`` are only *mapped* —
    the per-tile controller always uses the fixed ``DEFAULT_FIXED_DT0``
    start, so neither the HNW auto-start NFE win (dopri5 25→20 on trained
    fields) nor the carried warm start (2.37x on the XLA adaptive path)
    applies inside the kernel; the ``args["dt0"]`` channel is attached after
    the kernel gate in ``core._solve`` and never reaches it.  Configs
    outside the gate silently take the XLA path, which honors all three."""
    from ..models.nets import MLP

    return (
        cfg.fused
        and cfg.fused_adaptive  # measured negative by default — see config.py
        and cfg.layout == "batch_first"
        and cfg.solver.method == "dopri5"
        and cfg.solver.gradient == "adjoint"
        and mode is Mode.TRAIN
        and cfg.norm_z
        and cfg.norm_j
        and cfg.trace_for(mode) is TraceEstimator.HUTCH_VJP
        and cfg.nprobes == 1
        and isinstance(net, MLP)
        and len(net.widths) == 4
        and net.widths[1] == net.widths[2]
        and net.widths[1] <= LANE
        and net.activation is jax.nn.softplus
        and cfg.n_in <= LANE
        and cfg.state_dim <= LANE
        and jax.default_backend() == "tpu"
    )


# Forward tiles at 256 rows; the backward keeps 6 stages of intermediates
# (~15 arrays each) plus the (max_nodes, tile, 128) node buffer in VMEM, so
# it tiles at 128.  The gate requires the batch to tile at the *backward*
# granularity (the forward reuses it when 256 doesn't divide the batch).
_FWD_TILE = 256
_BWD_TILE = 128


def fused_adaptive_tile(batch: int) -> Optional[int]:
    return _tile_for(batch, _BWD_TILE)


def stats_from_rows(rows: jax.Array, tdt=jnp.float32) -> SolverStats:
    """Fold the per-tile stats rows into one :class:`SolverStats`.  Per-tile
    controllers take different step counts, so NFE/accept/reject report the
    **worst tile** (the critical path — comparable to the XLA path's single
    global controller, which forces every sample onto the worst-case step
    sequence) and ``dt_final`` the smallest-magnitude final step."""
    nfe = jnp.max(rows[:, 0]).astype(jnp.int32)
    nacc = jnp.max(rows[:, 1]).astype(jnp.int32)
    nrej = jnp.max(rows[:, 2]).astype(jnp.int32)
    i_min = jnp.argmin(jnp.abs(rows[:, 3]))
    return SolverStats(nfe, nacc, nrej, rows[i_min, 3].astype(tdt))


def _scfg_tuple(solver: SolverConfig):
    """Static controller tuple from a :class:`SolverConfig`.  See the module
    docstring's "SolverConfig coverage" for the honored/mapped/N-A split."""
    return (
        float(solver.rtol),
        float(solver.atol),
        # mapped field: the per-tile controller keeps a fixed start; dt0="auto"
        # (the XLA paths' HNW starting-step algorithm) maps to the old default
        DEFAULT_FIXED_DT0 if isinstance(solver.dt0, str) else float(solver.dt0),
        float(solver.safety),
        float(solver.min_factor),
        float(solver.max_factor),
        int(solver.max_steps),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_solve_dopri5(u0, eps, ys_pad, params, tspan, nz: int, t_col,
                       scfg: tuple, max_nodes: int):
    """Adaptive whole-solve forward.  Same calling convention as
    :func:`pallas_solve.fused_solve_rk4` plus ``scfg`` (the static solver
    tuple from ``SolverConfig`` — see ``_scfg_tuple``) and ``max_nodes`` (the
    backward node-buffer capacity).  Returns ``(u1, stats_rows)`` where
    ``stats_rows`` is a ``(num_tiles, 128)`` float32 array — fold it with
    :func:`stats_from_rows`."""
    (u1, rows), _ = _fused_adaptive_fwd(u0, eps, ys_pad, params, tspan, nz,
                                        t_col, scfg, max_nodes)
    return u1, rows


def _prep(u0, eps, ys_pad, params, tspan, nz, t_col):
    b, sd = u0.shape
    n_in = params[0]["w"].shape[0]
    h = params[0]["w"].shape[1]
    n_out = params[2]["w"].shape[1]
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
    t1a = jnp.asarray(t1, F32).reshape(1, 1)
    return b, sd, n_in, h, n_out, u0_p, eps_p, ys_full, packed, t0a, t1a


def _fused_adaptive_fwd(u0, eps, ys_pad, params, tspan, nz, t_col, scfg,
                        max_nodes):
    (b, sd, n_in, h, n_out, u0_p, eps_p, ys_full, packed, t0a, t1a) = _prep(
        u0, eps, ys_pad, params, tspan, nz, t_col
    )
    tb = _tile_for(b, _FWD_TILE) or _tile_for(b, _BWD_TILE)
    assert tb is not None, "caller must check fused_adaptive_tile"
    smem, vrow, _vc, _vb, wspecs = _specs(tb, LANE)
    stat_spec = pl.BlockSpec((b // tb, LANE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    u1_p, rows = pl.pallas_call(
        functools.partial(_adaptive_fwd_kernel, nz, sd, t_col, scfg),
        grid=(b // tb,),
        in_specs=[smem, smem, vrow, vrow, vrow, *wspecs],
        out_specs=[vrow, stat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, LANE), F32),
            jax.ShapeDtypeStruct((b // tb, LANE), F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * 6 * 12 * b * LANE * LANE,
            bytes_accessed=4 * b * 4 * LANE,
            transcendentals=40 * 6 * 4 * b * LANE,
        ),
        interpret=jax.default_backend() != "tpu",
    )(t0a, t1a, u0_p, eps_p, ys_full, *packed)
    u1 = u1_p[:, :sd]
    return (u1, rows), (u0, eps, ys_pad, params, tspan)


def _fused_adaptive_bwd(nz, t_col, scfg, max_nodes, residuals, cotangents):
    # safety clamp at the kernel's own API (not just core._solve): a larger
    # buffer compile-time-OOMs scoped VMEM after a multi-minute Mosaic
    # compile (measured at 128 nodes — module docstring)
    max_nodes = min(max_nodes, MAX_NODES_VMEM_CAP)
    g, _g_rows = cotangents  # stats rows are diagnostics — cotangent dropped
    u0, eps, ys_pad, params, tspan = residuals
    (b, sd, n_in, h, n_out, u0_p, eps_p, ys_full, packed, t0a, t1a) = _prep(
        u0, eps, ys_pad, params, tspan, nz, t_col
    )
    tb = _tile_for(b, _BWD_TILE)
    assert tb is not None
    smem, vrow, _vc, _vb, wspecs = _specs(tb, LANE)
    g_p = jnp.pad(g.astype(F32), ((0, 0), (0, LANE - sd)))

    outs = pl.pallas_call(
        functools.partial(_adaptive_bwd_kernel, nz, sd, t_col, scfg, max_nodes),
        grid=(b // tb,),
        in_specs=[smem, smem, vrow, vrow, vrow, *wspecs, vrow],
        out_specs=[vrow, vrow, *wspecs],
        out_shape=[
            jax.ShapeDtypeStruct((b, LANE), F32),
            jax.ShapeDtypeStruct((b, LANE), F32),
            jax.ShapeDtypeStruct((LANE, LANE), F32),
            jax.ShapeDtypeStruct((1, LANE), F32),
            jax.ShapeDtypeStruct((LANE, LANE), F32),
            jax.ShapeDtypeStruct((1, LANE), F32),
            jax.ShapeDtypeStruct((LANE, LANE), F32),
            jax.ShapeDtypeStruct((1, LANE), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((max_nodes, tb, LANE), F32),
            pltpu.SMEM((max_nodes,), F32),
            pltpu.SMEM((max_nodes,), F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * 6 * 40 * b * LANE * LANE,
            bytes_accessed=4 * b * 6 * LANE,
            transcendentals=40 * 6 * 15 * b * LANE,
        ),
        interpret=jax.default_backend() != "tpu",
    )(t0a, t1a, u0_p, eps_p, ys_full, *packed, g_p)

    u0bar_p, epsbar_p, w1b, b1b, w2b, b2b, w3b, b3b = outs
    params_bar = [
        {"w": w1b[:n_in, :h], "b": b1b[0, :h]},
        {"w": w2b[:h, :h], "b": b2b[0, :h]},
        {"w": w3b[:h, :n_out], "b": b3b[0, :n_out]},
    ]
    ysbar = None if ys_pad is None else jnp.zeros_like(ys_pad)
    t0, t1 = tspan
    tbar = (jnp.zeros_like(jnp.asarray(t0, F32)),
            jnp.zeros_like(jnp.asarray(t1, F32)))
    return (
        u0bar_p[:, :sd].astype(u0.dtype),
        epsbar_p[:, : eps.shape[1]].astype(eps.dtype),
        ysbar,
        params_bar,
        tbar,
    )


def _fused_adaptive_fwd_rule(u0, eps, ys_pad, params, tspan, nz, t_col, scfg,
                             max_nodes):
    return _fused_adaptive_fwd(u0, eps, ys_pad, params, tspan, nz, t_col,
                               scfg, max_nodes)


fused_solve_dopri5.defvjp(_fused_adaptive_fwd_rule, _fused_adaptive_bwd)
