"""Pluggable base / probe distributions (reference ``basedist``/``epsdist``
constructor arguments, icnf.jl:76-83; consumed at base_icnf.jl:158-172 and
base_icnf.jl:207-208)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import continuousnormalizingflows_tpu as cnf
from continuousnormalizingflows_tpu import distributions as dists
from continuousnormalizingflows_tpu.config import Mode, SolverConfig

FAST = SolverConfig(method="rk4", gradient="backprop", fixed_steps=16)


def zero_flow(base_dist, nvariables=2, **kw):
    """An identity flow: zero net params ⇒ f ≡ 0 ⇒ z(t1) = x, Δlogp = 0, so
    logp̂x must equal the base log-density exactly (closed-form parity)."""
    icnf = cnf.ICNF.create(nvariables=nvariables, naugments=0, lambda_3=0.0,
                           base_dist=base_dist, solver=FAST, **kw)
    params = jax.tree_util.tree_map(jnp.zeros_like, icnf.init(jax.random.PRNGKey(0)))
    return icnf, params


def scipy_ref(name, x):
    from scipy import stats

    if name == "logistic":
        return stats.logistic.logpdf(x)
    if name == "student_t":
        return stats.t.logpdf(x, df=5.0)
    raise KeyError(name)


@pytest.mark.parametrize("name,dist", [
    ("logistic", dists.logistic()),
    ("student_t", dists.student_t(5.0)),
])
def test_identity_flow_matches_scipy_closed_form(name, dist):
    icnf, params = zero_flow(dist)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 2)) * 1.5,
                    jnp.float32)
    lp, _augs, _stats = cnf.inference(icnf, Mode.TEST, x, params)
    want = scipy_ref(name, np.asarray(x)).sum(axis=-1)
    np.testing.assert_allclose(np.asarray(lp), want, rtol=1e-5, atol=1e-5)


def test_identity_flow_diag_normal_and_mixture():
    d = dists.diag_normal((0.5, -1.0), (2.0, 0.5))
    icnf, params = zero_flow(d)
    x = jnp.array([[0.0, 0.0], [1.0, -1.0], [3.0, 0.2]])
    lp = cnf.log_prob(icnf, Mode.TEST, x, params)
    from scipy import stats

    want = (stats.norm.logpdf(np.asarray(x[:, 0]), 0.5, 2.0)
            + stats.norm.logpdf(np.asarray(x[:, 1]), -1.0, 0.5))
    np.testing.assert_allclose(np.asarray(lp), want, rtol=1e-5, atol=1e-5)

    m = dists.normal_mixture((-2.0, 2.0), (0.7, 0.7), (0.3, 0.7))
    icnf_m, params_m = zero_flow(m)
    lp_m = cnf.log_prob(icnf_m, Mode.TEST, x, params_m)
    comp = np.stack([
        stats.norm.logpdf(np.asarray(x), -2.0, 0.7) + math.log(0.3),
        stats.norm.logpdf(np.asarray(x), 2.0, 0.7) + math.log(0.7),
    ], -1)
    want_m = np.log(np.exp(comp).sum(-1)).sum(-1)
    np.testing.assert_allclose(np.asarray(lp_m), want_m, rtol=1e-5, atol=1e-5)


def test_generate_draws_from_custom_base():
    """Identity flow ⇒ generate() returns raw base samples: check the first
    two moments of the logistic base (var = π²/3)."""
    icnf, params = zero_flow(dists.logistic())
    s = cnf.generate(icnf, Mode.TEST, params, jax.random.PRNGKey(3), 4000)
    assert abs(float(jnp.mean(s))) < 0.1
    np.testing.assert_allclose(float(jnp.var(s)), math.pi**2 / 3.0, rtol=0.1)


def test_inference_generate_roundtrip_nongaussian_base():
    """With RANDOM net params (a genuinely warped flow) and a logistic base:
    generate_with_logp's density must match an independent inference() call
    on the returned samples to solver tolerance — the full pluggable-base
    path through both solve directions."""
    icnf = cnf.ICNF.create(nvariables=2, naugments=0, lambda_3=0.0,
                           base_dist=dists.logistic(), solver=FAST)
    params = icnf.init(jax.random.PRNGKey(0))
    s, lp_gen = cnf.generate_with_logp(icnf, Mode.TEST, params,
                                       jax.random.PRNGKey(1), 64)
    lp_inf = cnf.log_prob(icnf, Mode.TEST, s, params)
    np.testing.assert_allclose(np.asarray(lp_gen), np.asarray(lp_inf),
                               rtol=1e-3, atol=1e-3)
    # trace-free sampling shares the base draw: same key ⇒ same samples
    s_tf = cnf.generate(icnf, Mode.TEST, params, jax.random.PRNGKey(1), 64,
                        trace_free=True)
    np.testing.assert_allclose(np.asarray(s_tf), np.asarray(s),
                               rtol=1e-3, atol=1e-3)


def test_dist_facade_and_fit_with_custom_base():
    """ICNFDist + ICNFModel.fit work end-to-end on a non-Gaussian base: the
    loss decreases and the facade density integrates to ~1 in 1-D."""
    from continuousnormalizingflows_tpu.utils import datasets

    x = datasets.beta_samples(jax.random.PRNGKey(7), 512)
    icnf = cnf.ICNF.create(nvariables=1, naugments=0, lambda_3=0.0,
                           base_dist=dists.logistic(), solver=FAST)
    model = cnf.ICNFModel(icnf, batchsize=0, epochs=60, key=jax.random.PRNGKey(1))
    res = model.fit(x)
    assert res.stats["final_loss"] < res.history[0]
    d = cnf.ICNFDist(icnf, res.params)
    grid = jnp.linspace(-6.0, 7.0, 651)[:, None]
    integral = float(np.trapezoid(np.asarray(d.pdf(grid)).ravel(), dx=13.0 / 650))
    assert abs(integral - 1.0) < 0.05, integral


def test_custom_probe_unbiased_and_custom_sampler():
    """A custom epsdist (uniform probe): the Hutchinson Δlogp estimate
    averaged over a large probe ensemble converges to the exact trace."""
    icnf_exact = cnf.ICNF.create(nvariables=2, solver=FAST)
    params = icnf_exact.init(jax.random.PRNGKey(0))
    x = 0.4 * jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    lp_exact, _, _ = cnf.inference(icnf_exact, Mode.TEST, x, params)

    icnf_u = cnf.ICNF.create(nvariables=2, probe_dist=dists.uniform_probe(),
                             nprobes=256, steer_rate=0.0, solver=FAST)
    lp_u, _, _ = cnf.inference(icnf_u, Mode.TRAIN_NOREG, x, params,
                               key=jax.random.PRNGKey(2))
    err = float(jnp.max(jnp.abs(lp_u - lp_exact)))
    assert err < 0.15, err  # 256-probe MC error on a tiny trace
    # probe draws actually come from the custom sampler (bounded support)
    from continuousnormalizingflows_tpu.core import sample_probe

    eps = sample_probe(icnf_u.config, jax.random.PRNGKey(3), 128)
    assert float(jnp.max(jnp.abs(eps))) <= math.sqrt(3.0) + 1e-6
    np.testing.assert_allclose(float(jnp.var(eps)), 1.0, rtol=0.05)


def test_factories_cached_and_config_validation():
    """lru_cache'd factories return identical objects (no jit retraces), and
    config validation rejects a half-specified base."""
    assert dists.logistic() is dists.logistic()
    assert dists.student_t(5.0) is dists.student_t(5.0)
    assert dists.normal_mixture((0.0,), (1.0,), (1.0,)) is \
        dists.normal_mixture((0.0,), (1.0,), (1.0,))
    c1 = cnf.ICNF.create(nvariables=2, base_dist=dists.logistic(), solver=FAST)
    c2 = cnf.ICNF.create(nvariables=2, base_dist=dists.logistic(), solver=FAST)
    assert c1.config == c2.config  # equal static jit keys ⇒ cache hit
    with pytest.raises(ValueError, match="logpdf_fn and sample_fn"):
        cnf.ICNF.create(nvariables=2, base_dist=dists.uniform_probe())
    with pytest.raises(ValueError):
        dists.student_t(-1.0)
    with pytest.raises(ValueError):
        dists.normal_mixture((0.0, 1.0), (1.0,), (1.0, 1.0))
