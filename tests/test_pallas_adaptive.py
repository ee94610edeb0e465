"""Adaptive whole-solve Pallas kernel vs the XLA dopri5 path (interpret mode).

Parity contract (see ops/pallas_adaptive.py docstring): with a single batch
tile the kernel's controller sees the same error norm as the XLA path's
global norm, so the step sequence — and therefore the solution and the NFE —
must match to float tolerance.  With multiple tiles each tile adapts
independently, so parity is distributional: every tile satisfies the local
tolerance and results agree with the XLA solve to O(tol).

Gradients are exact discrete BPTT over the frozen accepted-step sequence;
at tight solver tolerances they must agree with (a) the continuous-adjoint
gradient and (b) dense fixed-step backprop, both of which approximate the
same continuous sensitivity.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import continuousnormalizingflows_tpu as cnf
from continuousnormalizingflows_tpu.config import ICNFConfig, Mode, SolverConfig
from continuousnormalizingflows_tpu.ops.adjoint import odeint_diff
from continuousnormalizingflows_tpu.ops.dynamics import make_augmented_dynamics
from continuousnormalizingflows_tpu.ops.pallas_adaptive import (
    _scfg_tuple,
    fused_adaptive_applicable,
    fused_adaptive_tile,
    fused_solve_dopri5,
    stats_from_rows,
)
from continuousnormalizingflows_tpu.ops.ode import odeint_dopri5


def make(rtol=1e-4, nconditions=0, gradient="adjoint"):
    # dt0 pinned to the fixed-fraction start: the fused kernels implement
    # fixed-start only (dt0="auto" maps to 0.01 — see pallas_adaptive
    # "SolverConfig coverage"), so bit-close parity with the XLA path
    # requires running the XLA controller from the same start.
    solver = SolverConfig(method="dopri5", rtol=rtol, atol=rtol,
                          gradient=gradient, dt0=0.01)
    icnf = cnf.ICNF.create(nvariables=2, nconditions=nconditions,
                           solver=solver)
    return icnf


def data(icnf, b, conditioned=False):
    cfg = icnf.config
    params = icnf.init(jax.random.PRNGKey(0))
    u0 = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (b, cfg.state_dim))
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, b, cfg.nz))
    ys = 0.3 * jnp.ones((b, cfg.nconditions)) if conditioned else None
    return params, u0, eps, ys


def run_xla(icnf, ys, t0=0.0, t1=1.0):
    f_aug = make_augmented_dynamics(icnf.config, icnf.net, Mode.TRAIN)

    def go(u0, eps, params):
        args = {"params": params, "eps": eps, "ys": ys}
        return odeint_dopri5(f_aug, u0, t0, t1, args, icnf.config.solver)

    return go


def run_fused(icnf, ys, max_nodes=64, t0=0.0, t1=1.0):
    cfg = icnf.config
    t_col = cfg.nz if not cfg.autonomous else None
    scfg = _scfg_tuple(cfg.solver)

    def go(u0, eps, params):
        return fused_solve_dopri5(
            u0, eps[0], ys, params, (t0, t1), cfg.nz, t_col, scfg, max_nodes
        )

    return go


@pytest.mark.parametrize("conditioned", [False, True])
def test_single_tile_matches_xla_bitclose(conditioned):
    """One tile ⇒ the tile error norm IS the global norm ⇒ identical
    accept/reject sequence, solution, and NFE."""
    icnf = make(nconditions=2 if conditioned else 0)
    params, u0, eps, ys = data(icnf, 16, conditioned)

    u1_x, stats_x = jax.jit(run_xla(icnf, ys))(u0, eps, params)
    u1_f, rows = jax.jit(run_fused(icnf, ys))(u0, eps, params)
    stats_f = stats_from_rows(rows)

    np.testing.assert_allclose(np.asarray(u1_f), np.asarray(u1_x),
                               rtol=2e-4, atol=2e-5)
    assert int(stats_f.nfe) == int(stats_x.nfe)
    assert int(stats_f.naccept) == int(stats_x.naccept)


def test_multi_tile_within_tolerance():
    """4 tiles: per-tile controllers diverge from the global one, but every
    result stays within O(tol) of the XLA solve and no tile exceeds the
    worst-case (global) step count."""
    icnf = make()
    params, u0, eps, ys = data(icnf, 32)

    u1_x, stats_x = jax.jit(run_xla(icnf, ys))(u0, eps, params)

    def go_tiled(u0_, eps_, params_):
        # force 4 tiles of 8 by running each slice through its own kernel
        # launch is NOT what production does — instead rely on _tile_for
        # picking min(requested, b); emulate multi-tile by batch 32 with an
        # 8-row tile via the private entry
        cfg = icnf.config
        from continuousnormalizingflows_tpu.ops import pallas_adaptive as pa

        old_fwd, old_bwd = pa._FWD_TILE, pa._BWD_TILE
        pa._FWD_TILE = pa._BWD_TILE = 8
        try:
            out = run_fused(icnf, ys)(u0_, eps_, params_)
        finally:
            pa._FWD_TILE, pa._BWD_TILE = old_fwd, old_bwd
        return out

    u1_f, rows = jax.jit(go_tiled)(u0, eps, params)
    stats_f = stats_from_rows(rows)
    assert rows.shape[0] == 4
    # distributional parity: both solves satisfy the same local tolerance
    np.testing.assert_allclose(np.asarray(u1_f), np.asarray(u1_x),
                               rtol=5e-3, atol=5e-3)
    # per-tile adaptivity never takes MORE steps than the global controller
    # forces (worst tile <= global + slack for controller path dependence)
    assert int(stats_f.naccept) <= int(stats_x.naccept) + 2


def test_grads_match_adjoint_and_backprop():
    """Discrete-BPTT kernel gradients vs the continuous backsolve adjoint and
    vs dense fixed-step backprop, at tight tolerance (all three approximate
    the same continuous sensitivity)."""
    icnf = make(rtol=1e-6)
    cfg = icnf.config
    params, u0, eps, ys = data(icnf, 16)
    w = jnp.arange(1.0, cfg.state_dim + 1.0)

    def loss_fused(u0_, eps_, p_):
        u1, _rows = run_fused(icnf, ys)(u0_, eps_, p_)
        return jnp.sum(u1 * w)

    f_aug = make_augmented_dynamics(cfg, icnf.net, Mode.TRAIN)

    def loss_adjoint(u0_, eps_, p_):
        args = {"params": p_, "eps": eps_, "ys": ys}
        u1, _ = odeint_diff(f_aug, u0_, 0.0, 1.0, args, cfg.solver)
        return jnp.sum(u1 * w)

    bp_solver = SolverConfig(method="rk4", gradient="backprop",
                             fixed_steps=128, remat=False)

    def loss_backprop(u0_, eps_, p_):
        args = {"params": p_, "eps": eps_, "ys": ys}
        u1, _ = odeint_diff(f_aug, u0_, 0.0, 1.0, args, bp_solver)
        return jnp.sum(u1 * w)

    g_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(u0, eps, params)
    g_a = jax.jit(jax.grad(loss_adjoint, argnums=(0, 1, 2)))(u0, eps, params)
    g_b = jax.jit(jax.grad(loss_backprop, argnums=(0, 1, 2)))(u0, eps, params)

    # the slim backsolve adjoint returns a structural zero for the probe
    # cotangent (ops/adjoint.py) — compare the eps grad against backprop only
    for a, b in zip(
        jax.tree_util.tree_leaves((g_f[0], g_f[2])),
        jax.tree_util.tree_leaves((g_a[0], g_a[2])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_node_overflow_poisons_grads_not_forward():
    """max_nodes smaller than the accepted-step count: the forward is still
    valid, the backward NaN-poisons every gradient (loud-failure policy —
    never a silently truncated BPTT)."""
    icnf = make(rtol=1e-6)  # tight tol => many accepted steps
    params, u0, eps, ys = data(icnf, 8)

    go = run_fused(icnf, ys, max_nodes=2)
    u1, rows = jax.jit(go)(u0, eps, params)
    assert int(stats_from_rows(rows).naccept) > 2
    assert bool(jnp.all(jnp.isfinite(u1)))  # forward unaffected

    def loss(p_):
        u1_, _ = go(u0, eps, p_)
        return jnp.sum(u1_)

    g = jax.jit(jax.grad(loss))(params)
    assert all(
        bool(jnp.all(jnp.isnan(leaf))) for leaf in jax.tree_util.tree_leaves(g)
    )


def test_max_steps_exhaustion_poisons_forward():
    solver = SolverConfig(method="dopri5", rtol=1e-10, atol=1e-10,
                          max_steps=3, gradient="adjoint")
    icnf = cnf.ICNF.create(nvariables=2, solver=solver)
    params, u0, eps, ys = data(icnf, 8)
    u1, _rows = jax.jit(run_fused(icnf, ys))(u0, eps, params)
    assert bool(jnp.all(jnp.isnan(u1)))


def test_applicability_gate():
    icnf = make()
    # CPU backend → not applicable (kernel enabled on TPU only)
    assert not fused_adaptive_applicable(icnf.config, icnf.net, Mode.TRAIN)
    # fused alone no longer routes the adaptive kernel (measured negative,
    # PARITY.md round 3) — fused_adaptive must ALSO be set
    cfg_f = dataclasses.replace(icnf.config, fused=True)
    assert not fused_adaptive_applicable(cfg_f, icnf.net, Mode.TRAIN)
    cfg_on = dataclasses.replace(icnf.config, fused=True, fused_adaptive=True)
    assert not fused_adaptive_applicable(cfg_on, icnf.net, Mode.TEST)
    # quadrature gradients keep the XLA interpolation adjoint
    cfg_q = dataclasses.replace(
        cfg_on, solver=dataclasses.replace(cfg_on.solver, gradient="quadrature")
    )
    assert not fused_adaptive_applicable(cfg_q, icnf.net, Mode.TRAIN)
    # tiling gate
    assert fused_adaptive_tile(256) == 128
    assert fused_adaptive_tile(64) == 64
    assert fused_adaptive_tile(100) is None
