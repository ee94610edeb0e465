"""Real image data end-to-end: sklearn handwritten digits (1,797 real 8x8
images) through the full quantized-image pipeline — uniform dequantization,
logit transform, standardization, RNODE fit, bits/dim under the
dequantization bound.

The reference's real-data pattern (fit samples, evaluate the fitted density
— examples/usage.jl:60-127, test/ci_tests/regression_tests.jl:17-28) has no
analytic pdf to compare against, so the asserted yardsticks are (a) a
held-out test set and (b) a diagonal Gaussian fitted on the train logits:
the flow must beat the Gaussian by a measured margin without overfitting.
Full-scale run + thresholds provenance: benchmarks/digits_bitsdim.py
(measured: 200 smoke steps reach test 2.55 bits/dim vs Gaussian 2.88).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import continuousnormalizingflows_tpu as cnf
from continuousnormalizingflows_tpu.config import Mode, SolverConfig
from continuousnormalizingflows_tpu.models.nets import MLP
from continuousnormalizingflows_tpu.utils import datasets

D = 64
ALPHA = 0.05
STEPS = 200
BATCH = 128


@pytest.fixture(scope="module")
def digits_fit():
    # canonical split + standardization — SHARED with the benchmark whose
    # measured numbers set these thresholds (utils.datasets helpers)
    x_train_i, x_test_i = datasets.digits_split()
    m, s, log_s_sum, y0 = datasets.digits_standardizer(x_train_i, alpha=ALPHA)

    cfg = cnf.ICNFConfig(
        nvariables=D, naugments=0, lambda_1=0.01, lambda_2=0.01, lambda_3=0.0,
        steer_rate=0.0,
        solver=SolverConfig(method="rk4", gradient="backprop", fixed_steps=24),
    )
    net = MLP((cfg.n_in, 128, 128, cfg.n_out))
    icnf = cnf.ICNF(config=cfg, net=net)
    params = icnf.init(jax.random.PRNGKey(0))
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(1e-3, weight_decay=1e-4))
    opt_state = opt.init(params)

    @jax.jit
    def run(params, opt_state, key):
        def step(carry, _):
            params, opt_state, key = carry
            key, k_b, k_u, k_s = jax.random.split(key, 4)
            idx = jax.random.randint(k_b, (BATCH,), 0, x_train_i.shape[0])
            yb, _ = datasets.dequantize_logit(
                jnp.take(x_train_i, idx, axis=0), k_u, alpha=ALPHA
            )
            l, g = jax.value_and_grad(
                lambda p: cnf.loss(icnf, Mode.TRAIN, (yb - m) / s, p, key=k_s)
            )(params)
            updates, opt_state = opt.update(g, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, key), l

        (params, opt_state, _), ls = jax.lax.scan(
            step, (params, opt_state, key), jnp.arange(STEPS)
        )
        return params, opt_state, ls

    params, _o, losses = run(params, opt_state, jax.random.PRNGKey(3))

    import dataclasses

    icnf_eval = cnf.ICNF(
        config=dataclasses.replace(
            cfg, solver=SolverConfig(method="dopri5", rtol=1e-4, atol=1e-4)
        ),
        net=MLP(net.widths, precision="highest"),
    )

    def bpd_on(x_int, key):
        y, ldj = datasets.dequantize_logit(x_int, key, alpha=ALPHA)
        lp_v, _a, _s = cnf.inference(icnf_eval, Mode.TEST, (y - m) / s, params)
        return float(
            jnp.mean(datasets.quantized_bits_per_dim(lp_v - log_s_sum, ldj, D))
        )

    k_ev = jax.random.PRNGKey(9)
    bpd_test = bpd_on(x_test_i, k_ev)
    bpd_train = bpd_on(x_train_i[:512], k_ev)

    # diagonal-Gaussian yardstick on the same test draw (shared formula)
    y_te, ldj_te = datasets.dequantize_logit(x_test_i, k_ev, alpha=ALPHA)
    logp_g = datasets.diagonal_gaussian_logp(y0, y_te)
    bpd_gauss = float(jnp.mean(datasets.quantized_bits_per_dim(logp_g, ldj_te, D)))
    return losses, bpd_train, bpd_test, bpd_gauss


def test_digits_beats_gaussian_baseline(digits_fit):
    losses, bpd_train, bpd_test, bpd_gauss = digits_fit
    # measured (this exact config): test 2.55 vs Gaussian 2.88 after 200
    # steps; thresholds leave ~2x headroom on the margin
    assert np.isfinite(np.asarray(losses)).all()
    assert bpd_test < bpd_gauss - 0.15, (bpd_test, bpd_gauss)
    assert bpd_test < 2.75, bpd_test
    # uniform model is log2(17) = 4.09 bits/dim; sanity on the yardstick
    assert 2.0 < bpd_gauss < 3.5, bpd_gauss


def test_digits_no_overfit_at_this_scale(digits_fit):
    _l, bpd_train, bpd_test, _g = digits_fit
    # fresh dequantization noise per step keeps train/test gap small
    # (measured +0.02 at 200 steps; the round-2 overfitting failure mode
    # showed up as a runaway train-test gap)
    assert bpd_test - bpd_train < 0.25, (bpd_train, bpd_test)


def test_random_shift_images():
    """±1px translation augmentation (batch_transform lever for the
    small-real-data overfit gap — measured on digits at the p=0.5 record:
    gap 0.32 → 0.25 and test 2.205 → 2.110 bits/dim, PARITY round 4): zero
    fill, content preserved, max_shift=0 is the identity, shifts vary per
    sample."""
    x = datasets.digits_data()[:32]
    x = jnp.asarray(x, jnp.int32)
    out = datasets.random_shift_images(jax.random.PRNGKey(0), x, side=8)
    assert out.shape == x.shape and out.dtype == x.dtype
    # identity at max_shift=0
    np.testing.assert_array_equal(
        np.asarray(datasets.random_shift_images(jax.random.PRNGKey(1), x, 8,
                                                max_shift=0)),
        np.asarray(x),
    )
    # every shifted pixel value existed in the original image or is the fill
    for i in range(8):
        orig = set(np.asarray(x[i]).tolist()) | {0}
        assert set(np.asarray(out[i]).tolist()) <= orig
    # a known image shifts exactly: delta at (r, c) moves by (dy, dx)
    img = jnp.zeros((1, 64), jnp.int32).at[0, 8 * 3 + 4].set(9)  # (3, 4)
    for key in range(6):
        o = np.asarray(
            datasets.random_shift_images(jax.random.PRNGKey(key), img, 8)
        ).reshape(8, 8)
        locs = np.argwhere(o == 9)
        assert len(locs) == 1
        dy, dx = locs[0][0] - 3, locs[0][1] - 4
        assert abs(dy) <= 1 and abs(dx) <= 1
    # shifts are per-sample (a batch of identical images diverges)
    rep = jnp.tile(img, (16, 1))
    o = np.asarray(datasets.random_shift_images(jax.random.PRNGKey(2), rep, 8))
    assert len({tuple(r.tolist()) for r in o}) > 1
