"""Whole-solve Pallas kernel vs the XLA scan path (interpret mode on CPU).

The forward must reproduce odeint_fixed over the same dynamics bit-closely,
and the hand-derived exact-discrete backward must match
backprop-through-scan gradients.
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
from continuousnormalizingflows_tpu.ops.pallas_solve import fused_solve_applicable, fused_solve_rk4

STEPS = 8


def make(nconditions=0, autonomous=False):
    cfg = ICNFConfig(
        nvariables=2,
        nconditions=nconditions,
        autonomous=autonomous,
        solver=SolverConfig(method="rk4", gradient="backprop", fixed_steps=STEPS,
                            remat=False),
    )
    icnf = cnf.ICNF.create(
        nvariables=2, nconditions=nconditions, autonomous=autonomous,
        solver=cfg.solver,
    )
    return icnf


def run_xla(icnf, u0, eps, ys, t0=0.0, t1=1.0):
    f_aug = make_augmented_dynamics(icnf.config, icnf.net, Mode.TRAIN)

    def go(u0, eps, params):
        args = {"params": params, "eps": eps, "ys": ys}
        u1, _ = odeint_diff(f_aug, u0, t0, t1, args, icnf.config.solver)
        return u1

    return go


def run_fused(icnf, ys, t0=0.0, t1=1.0):
    cfg = icnf.config
    t_col = cfg.nz if not cfg.autonomous else None

    def go(u0, eps, params):
        return fused_solve_rk4(
            u0, eps[0], ys, params, (t0, t1), cfg.nz, t_col, STEPS, 8
        )

    return go


@pytest.mark.parametrize("conditioned", [False, True])
def test_forward_matches_scan(conditioned):
    icnf = make(nconditions=2 if conditioned else 0)
    cfg = icnf.config
    params = icnf.init(jax.random.PRNGKey(0))
    b = 16
    u0 = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.state_dim)) * 0.5
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, b, cfg.nz))
    ys = jnp.ones((b, 2)) * 0.3 if conditioned else None

    u1_x = jax.jit(run_xla(icnf, u0, eps, ys))(u0, eps, params)
    u1_f = jax.jit(run_fused(icnf, ys))(u0, eps, params)
    np.testing.assert_allclose(np.asarray(u1_f), np.asarray(u1_x), rtol=2e-4, atol=2e-5)


def test_autonomous_forward():
    icnf = make(autonomous=True)
    cfg = icnf.config
    params = icnf.init(jax.random.PRNGKey(0))
    u0 = jax.random.normal(jax.random.PRNGKey(1), (8, cfg.state_dim)) * 0.5
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.nz))
    u1_x = jax.jit(run_xla(icnf, u0, eps, None))(u0, eps, params)
    u1_f = jax.jit(run_fused(icnf, None))(u0, eps, params)
    np.testing.assert_allclose(np.asarray(u1_f), np.asarray(u1_x), rtol=2e-4, atol=2e-5)


def test_backward_matches_scan_grads():
    """Exact-discrete BPTT in-kernel vs jax backprop through lax.scan."""
    icnf = make()
    cfg = icnf.config
    params = icnf.init(jax.random.PRNGKey(0))
    b = 16
    u0 = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.state_dim)) * 0.5
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, b, cfg.nz))

    def loss_of(run):
        def loss(u0_, eps_, params_):
            u1 = run(u0_, eps_, params_)
            # weight every state column incl the accumulators
            w = jnp.arange(1.0, cfg.state_dim + 1.0)
            return jnp.sum(u1 * w)

        return loss

    g_x = jax.jit(jax.grad(loss_of(run_xla(icnf, u0, eps, None)), argnums=(0, 1, 2)))(
        u0, eps, params
    )
    g_f = jax.jit(jax.grad(loss_of(run_fused(icnf, None)), argnums=(0, 1, 2)))(
        u0, eps, params
    )
    for a, b_ in zip(jax.tree_util.tree_leaves(g_x), jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=5e-4, atol=5e-4)


def test_multi_tile_param_grads():
    """Param-grad accumulation across batch tiles in the backward kernel."""
    icnf = make()
    cfg = icnf.config
    params = icnf.init(jax.random.PRNGKey(0))
    b = 32  # 4 tiles of 8
    u0 = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.state_dim)) * 0.5
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, b, cfg.nz))

    def loss(run):
        return lambda p: jnp.sum(jnp.square(run(u0, eps, p)))

    g_x = jax.jit(jax.grad(loss(run_xla(icnf, u0, eps, None))))(params)
    g_f = jax.jit(jax.grad(loss(run_fused(icnf, None))))(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_x), jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-3, atol=1e-3)


def test_wide_hidden_forward_and_grads():
    """Hidden width above one lane tile (h=160 → hp=256): the tabular-scale
    band (BASELINE config 4).  Forward + gradients must match XLA."""
    from continuousnormalizingflows_tpu.models.nets import MLP

    cfg = ICNFConfig(
        nvariables=9,  # nz = 19, n_in = 20
        solver=SolverConfig(method="rk4", gradient="backprop", fixed_steps=4,
                            remat=False),
    )
    net = MLP((cfg.n_in, 160, 160, cfg.n_out))
    icnf = cnf.ICNF(config=cfg, net=net)
    params = icnf.init(jax.random.PRNGKey(0))
    b = 16
    u0 = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.state_dim)) * 0.3
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, b, cfg.nz))

    f_aug = make_augmented_dynamics(cfg, net, Mode.TRAIN)

    def go_xla(u0_, eps_, params_):
        args = {"params": params_, "eps": eps_, "ys": None}
        u1, _ = odeint_diff(f_aug, u0_, 0.0, 1.0, args, cfg.solver)
        return u1

    def go_fused(u0_, eps_, params_):
        return fused_solve_rk4(u0_, eps_[0], None, params_, (0.0, 1.0),
                               cfg.nz, cfg.nz, 4, 8)

    u1_x = jax.jit(go_xla)(u0, eps, params)
    u1_f = jax.jit(go_fused)(u0, eps, params)
    np.testing.assert_allclose(np.asarray(u1_f), np.asarray(u1_x),
                               rtol=5e-4, atol=5e-5)

    def loss(run):
        return lambda p: jnp.sum(jnp.square(run(u0, eps, p)))

    g_x = jax.jit(jax.grad(loss(go_xla)))(params)
    g_f = jax.jit(jax.grad(loss(go_fused)))(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_x), jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


def test_applicability_gate():
    icnf = make()
    # CPU backend -> not applicable (kernel used only on TPU)
    assert not fused_solve_applicable(icnf.config, icnf.net, Mode.TRAIN)
    assert not fused_solve_applicable(icnf.config, icnf.net, Mode.TEST)
    cfg_on = dataclasses.replace(icnf.config, fused=True)
    assert not fused_solve_applicable(cfg_on, icnf.net, Mode.TEST)  # exact trace


def test_gate_tile_consistency():
    """The applicability gate and the kernel's internal tile choice must use
    the same hidden-width shrink: h=176 with batch 144 used to pass the old
    gate (tile 144) and then crash inside the kernel (tile 128)."""
    from continuousnormalizingflows_tpu.ops.pallas_solve import fused_solve_tile

    # wide hidden shrinks the requested tile before the divisibility check
    assert fused_solve_tile(144, 176) is None  # 144 not divisible by 128
    assert fused_solve_tile(256, 176) == 128
    assert fused_solve_tile(256, 64) == 256
    assert fused_solve_tile(144, 64) == 144
    assert fused_solve_tile(100, 64) is None  # 100 % 8 != 0 tile impossible


def test_gate_mismatch_falls_back_to_xla():
    """End-to-end: a config passing fused_solve_applicable but with an
    un-tileable (batch, hidden) combination must run the XLA path, not crash
    (ADVICE round-1, pallas_solve gate/tile mismatch)."""
    from continuousnormalizingflows_tpu.models.nets import MLP
    from continuousnormalizingflows_tpu.core import _solve

    cfg = ICNFConfig(
        nvariables=9,
        fused=True,
        solver=SolverConfig(method="rk4", gradient="backprop", fixed_steps=4),
    )
    net = MLP((cfg.n_in, 176, 176, cfg.n_out))
    icnf = cnf.ICNF(config=cfg, net=net)
    params = icnf.init(jax.random.PRNGKey(0))
    b = 144  # passes _tile_for(b, 256) but not the width-shrunk tile
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (b, cfg.nvariables))
    lp, _augs, _nfe = cnf.inference(
        icnf, Mode.TRAIN, x, params, key=jax.random.PRNGKey(2)
    )
    assert lp.shape == (b,)
    assert jnp.all(jnp.isfinite(lp))
