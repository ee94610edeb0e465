"""Fused Pallas dynamics kernel vs the XLA reference formula.

On CPU the kernel runs in Pallas interpreter mode, so the same kernel math is
validated without TPU hardware; the TPU-compiled path is exercised by
bench.py on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from continuousnormalizingflows_tpu.models.nets import MLP
from continuousnormalizingflows_tpu.ops.pallas_kernels import (
    fused_dynamics_vjp,
    mlp3_forward_vjp_reference,
)


@pytest.fixture(scope="module")
def setup():
    n_in, h, n_out, nz = 6, 24, 5, 5
    net = MLP((n_in, h, h, n_out))
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, n_in))
    eps = jax.random.normal(jax.random.PRNGKey(2), (64, n_out))
    return params, x, eps, nz


def test_fused_matches_reference(setup):
    params, x, eps, nz = setup
    out_f = jax.jit(lambda x, e, p: fused_dynamics_vjp(x, e, p, nz))(x, eps, params)
    out_r = mlp3_forward_vjp_reference(x, eps, params, nz)
    names = ["y", "epsj_z", "div", "reg_z", "reg_j"]
    for name, a, b in zip(names, out_f, out_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5, err_msg=name
        )


def test_reference_matches_autodiff(setup):
    """The hand-derived reverse sweep must equal jax.vjp of the MLP."""
    params, x, eps, nz = setup
    net = MLP((6, 24, 24, 5))
    y_ref, epsj_z, div, _, _ = mlp3_forward_vjp_reference(x, eps, params, nz)
    y, vjp_fn = jax.vjp(lambda xx: net.apply(params, xx), x)
    epsj_auto = vjp_fn(eps)[0]
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(epsj_z), np.asarray(epsj_auto[:, :nz]), rtol=1e-4, atol=1e-5
    )


def test_fused_custom_vjp_grads(setup):
    """Gradients through the fused op (custom_vjp) match gradients through
    the reference formula — required by backprop-through-scan and the
    adjoint's in-solve VJPs."""
    params, x, eps, nz = setup

    def loss_fused(x_, p_):
        y, ej, div, rz, rj = fused_dynamics_vjp(x_, eps, p_, nz)
        return jnp.sum(y**2) + jnp.sum(div) + jnp.sum(rz) + jnp.sum(rj)

    def loss_ref(x_, p_):
        y, ej, div, rz, rj = mlp3_forward_vjp_reference(x_, eps, p_, nz)
        return jnp.sum(y**2) + jnp.sum(div) + jnp.sum(rz) + jnp.sum(rj)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_awkward_batch_falls_back(setup):
    params, x, eps, nz = setup
    # batch 13 not divisible by 8 -> XLA fallback, same results
    out = fused_dynamics_vjp(x[:13], eps[:13], params, nz)
    ref = mlp3_forward_vjp_reference(x[:13], eps[:13], params, nz)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_multi_tile_weight_grad_accumulation(setup):
    """Batch spanning several grid tiles: weight grads must accumulate across
    tiles exactly (the @pl.when(i==0) init + += pattern)."""
    params, _x, _eps, nz = setup
    x = jax.random.normal(jax.random.PRNGKey(4), (1024, 6))
    eps = jax.random.normal(jax.random.PRNGKey(5), (1024, 5))

    def loss_fused(x_, p_):
        y, ej, div, rz, rj = fused_dynamics_vjp(x_, eps, p_, nz, 256)
        return jnp.sum(y**2) + jnp.sum(div) + jnp.sum(rz * rj)

    def loss_ref(x_, p_):
        y, ej, div, rz, rj = mlp3_forward_vjp_reference(x_, eps, p_, nz)
        return jnp.sum(y**2) + jnp.sum(div) + jnp.sum(rz * rj)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(x, params)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(x, params)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_bf16_compute_dtype(setup):
    """compute_dtype=bfloat16: values within bf16 tolerance of the f32 path."""
    params, x, eps, nz = setup
    out_lo = jax.jit(
        lambda x, e, p: fused_dynamics_vjp(x, e, p, nz, 256, jnp.bfloat16)
    )(x, eps, params)
    out_hi = mlp3_forward_vjp_reference(x, eps, params, nz)
    for a, b in zip(out_lo, out_hi):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-2, atol=3e-2)


def test_eps_cotangent_through_div(setup):
    """grad w.r.t. eps flows through both div (first order) and the probe
    chain (the u2-path) — compare against autodiff of the reference."""
    params, x, eps, nz = setup

    def f(which):
        def loss(eps_):
            y, ej, div, rz, rj = which(x, eps_, params, nz)
            return jnp.sum(div * div) + jnp.sum(ej**2)

        return jax.grad(loss)(eps)

    g_fused = f(lambda *a: fused_dynamics_vjp(*a))
    g_ref = f(mlp3_forward_vjp_reference)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-5)
