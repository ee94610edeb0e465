"""Distribution facade tests (reference dist_ext smoke coverage, with
numeric checks)."""

import jax
import jax.numpy as jnp
import numpy as np

import continuousnormalizingflows_tpu as cnf
from continuousnormalizingflows_tpu.config import Mode, SolverConfig

FAST = SolverConfig(method="rk4", gradient="backprop", fixed_steps=16)


def make_fitted(nconditions=0):
    icnf = cnf.ICNF.create(nvariables=2, nconditions=nconditions, solver=FAST)
    params = icnf.init(jax.random.PRNGKey(0))
    return icnf, params


def test_logpdf_pdf_shapes():
    icnf, params = make_fitted()
    d = cnf.ICNFDist(icnf, params)
    assert len(d) == 2
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (5, 2))
    lp = d.logpdf(x)
    assert lp.shape == (5,)
    np.testing.assert_allclose(np.asarray(d.pdf(x)), np.exp(np.asarray(lp)), rtol=1e-5)
    # single sample -> scalar (reference VectorMode shim)
    assert d.logpdf(x[0]).shape == ()


def test_sample_shape_and_rand_alias():
    icnf, params = make_fitted()
    d = cnf.ICNFDist(icnf, params)
    s = d.sample(jax.random.PRNGKey(2), 7)
    assert s.shape == (7, 2) and bool(jnp.all(jnp.isfinite(s)))
    s2 = d.rand(jax.random.PRNGKey(2), 7)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))


def test_train_mode_dist_uses_fresh_probes():
    icnf, params = make_fitted()
    d = cnf.ICNFDist(icnf, params, mode=Mode.TRAIN)
    x = 0.3 * jnp.ones((3, 2))
    lp1, lp2 = d.logpdf(x), d.logpdf(x)
    assert not np.allclose(np.asarray(lp1), np.asarray(lp2))  # stochastic trace


def test_train_mode_per_call_key_reproducible():
    """key= pins the probe: identical calls return identical estimates, and
    the hidden key state is not advanced (reference ICNFDist carries a hidden
    rng too; here the override removes the surprise)."""
    icnf, params = make_fitted()
    d = cnf.ICNFDist(icnf, params, mode=Mode.TRAIN)
    x = 0.3 * jnp.ones((3, 2))
    k = jax.random.PRNGKey(7)
    lp1 = d.logpdf(x, key=k)
    lp2 = d.logpdf(x, key=k)
    np.testing.assert_array_equal(np.asarray(lp1), np.asarray(lp2))
    assert np.allclose(np.asarray(d.pdf(x, key=k)), np.exp(np.asarray(lp1)))


def test_all_modes_full_facade():
    """Every facade method works in every Mode — the round-3 verdict's
    confirmed repro was ICNFDist(mode=TRAIN_NOREG).logpdf raising
    'train mode needs a PRNG key' (dist.py gated the hidden probe key on
    `mode is TRAIN` instead of `mode.stochastic`; the reference's
    TrainMode{false} works through its ICNFDist because the rng rides in the
    model, dist_ext/core_icnf.jl:13-41)."""
    import pytest

    icnf, params = make_fitted()
    icnf_c, params_c = make_fitted(nconditions=2)
    ys = jnp.array([0.5, -0.5])
    x = 0.3 * jnp.ones((3, 2))
    for mode in (Mode.TEST, Mode.TRAIN, Mode.TRAIN_NOREG):
        for d in (cnf.ICNFDist(icnf, params, mode=mode),
                  cnf.CondICNFDist(icnf_c, params_c, ys, mode=mode)):
            lp = d.logpdf(x)
            assert lp.shape == (3,) and bool(jnp.all(jnp.isfinite(lp))), mode
            np.testing.assert_allclose(
                np.asarray(d.pdf(x, key=jax.random.PRNGKey(3))),
                np.exp(np.asarray(d.logpdf(x, key=jax.random.PRNGKey(3)))),
                rtol=1e-5,
            )
            s = d.sample(jax.random.PRNGKey(2), 4)
            assert s.shape == (4, 2) and bool(jnp.all(jnp.isfinite(s)))
            s2, lp2 = d.sample_with_logpdf(jax.random.PRNGKey(2), 4)
            assert s2.shape == (4, 2) and lp2.shape == (4,)
            assert bool(jnp.all(jnp.isfinite(lp2)))
    # the stochastic modes give stochastic estimates; TEST is deterministic
    d_nr = cnf.ICNFDist(icnf, params, mode=Mode.TRAIN_NOREG)
    assert not np.allclose(np.asarray(d_nr.logpdf(x)), np.asarray(d_nr.logpdf(x)))
    d_t = cnf.ICNFDist(icnf, params, mode=Mode.TEST)
    np.testing.assert_array_equal(np.asarray(d_t.logpdf(x)), np.asarray(d_t.logpdf(x)))


def test_features_first_layout_shim_warns_once():
    """(nvariables, n) inputs are transposed with a one-shot warning — the
    reference's cross-mode reshape shims (@warn maxlog=1,
    dist_ext/core_icnf.jl:22-41)."""
    import warnings as _w

    import continuousnormalizingflows_tpu.dist as dist_mod

    icnf, params = make_fitted()
    d = cnf.ICNFDist(icnf, params)
    x = 0.3 * jnp.ones((5, 2))  # batch-first, 5 samples of 2 vars
    lp_ref = d.logpdf(x)

    dist_mod._warned_transpose = False
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        lp_t = d.logpdf(x.T)  # features-first
        np.testing.assert_allclose(np.asarray(lp_t), np.asarray(lp_ref), rtol=1e-6)
        d.logpdf(x.T)
    assert sum("features-first" in str(r.message) for r in rec) == 1


def test_wrong_width_raises_cleanly():
    """A batch whose width matches neither (n, d) nor (d, n) fails with a
    clear ValueError at the facade, not a broadcast error inside the solve."""
    import pytest

    icnf, params = make_fitted()
    d = cnf.ICNFDist(icnf, params)
    with pytest.raises(ValueError, match="nvariables=2"):
        d.logpdf(jnp.zeros((3, 5)))


def test_conditional_dist():
    icnf, params = make_fitted(nconditions=2)
    ys = jnp.array([0.5, -0.5])
    d = cnf.CondICNFDist(icnf, params, ys)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    lp = d.logpdf(x)
    assert lp.shape == (4,) and bool(jnp.all(jnp.isfinite(lp)))
    s = d.sample(jax.random.PRNGKey(2), 3)
    assert s.shape == (3, 2)
    # conditioning actually matters
    d2 = cnf.CondICNFDist(icnf, params, jnp.array([5.0, 5.0]))
    assert not np.allclose(np.asarray(lp), np.asarray(d2.logpdf(x)))


def test_dist_density_integrates_to_one():
    """For an untrained tiny flow in 1-D, numerically integrate pdf over a wide
    grid — must be ~1 (conservation of probability through the flow).

    Note: with the reference-default augmentation the reported density is the
    zero-padded joint slice, which is *not* normalized over x alone — so this
    check uses an unaugmented model."""
    icnf = cnf.ICNF.create(
        nvariables=1, naugments=0, lambda_3=0.0,
        solver=SolverConfig(method="rk4", gradient="backprop", fixed_steps=32),
    )
    params = icnf.init(jax.random.PRNGKey(0))
    d = cnf.ICNFDist(icnf, params)
    grid = jnp.linspace(-8.0, 8.0, 801)[:, None]
    pdf = np.asarray(d.pdf(grid))
    integral = np.trapezoid(pdf[:, ], dx=16.0 / 800)
    assert abs(integral - 1.0) < 0.02, integral
