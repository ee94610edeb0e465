"""Image-scale learning regression (reduced): bits/dim on a known-likelihood
image task must converge toward the analytic optimum.

This is the asserted, reduced-scale version of BASELINE config 5
("MNIST-scale FFJORD") — the full 784-d convergence run lives in
benchmarks/image_bitsdim.py (curve recorded in PARITY.md).  The task is the
smooth-image mixture (RBF-covariance Gaussians over the pixel grid) whose
density is analytic, so the NLL gap is exactly measurable — the reference's
fitted-density-vs-truth pattern (test/ci_tests/regression_tests.jl:17-28) at
image scale.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import continuousnormalizingflows_tpu as cnf
from continuousnormalizingflows_tpu.config import Mode, SolverConfig
from continuousnormalizingflows_tpu.models.nets import MLP
from continuousnormalizingflows_tpu.utils import datasets

SIDE = 8  # mid-scale: close enough to the measured 784-d curve that the
D = SIDE * SIDE  # round-2 overfitting regression would have been caught here


@pytest.fixture(scope="module")
def image_fit():
    cfg = cnf.ICNFConfig(
        nvariables=D,
        naugments=0,
        lambda_1=0.01,
        lambda_2=0.01,
        lambda_3=0.0,
        steer_rate=0.0,
        solver=SolverConfig(method="rk4", gradient="backprop", fixed_steps=24),
    )
    net = MLP((cfg.n_in, 128, 128, cfg.n_out))
    icnf = cnf.ICNF(config=cfg, net=net)

    x = datasets.smooth_image_mixture(jax.random.PRNGKey(1), 8192, SIDE, 3)
    x_eval = datasets.smooth_image_mixture(jax.random.PRNGKey(2), 512, SIDE, 3)
    true_bpd = float(
        datasets.nats_to_bits_per_dim(
            -jnp.mean(datasets.smooth_image_mixture_logpdf(x_eval, SIDE, 3)), D
        )
    )

    model = cnf.ICNFModel(
        icnf,
        optimizer=cnf.default_optimizer(clip_norm=1.0),
        batchsize=256,
        epochs=19,  # 32 iters/epoch -> ~600 steps
        key=jax.random.PRNGKey(3),
        steps_per_dispatch=32,  # one dispatch per epoch (and spd coverage at scale)
    )

    # exact-trace eval twin (adaptive fp32 at reference tolerances)
    cfg_eval = dataclasses.replace(
        cfg, solver=SolverConfig(method="dopri5", rtol=1e-4, atol=1e-4)
    )
    icnf_eval = cnf.ICNF(config=cfg_eval, net=net)

    def bpd_of(params):
        lp, _a, _s = cnf.inference(icnf_eval, Mode.TEST, x_eval, params)
        return float(datasets.nats_to_bits_per_dim(-jnp.mean(lp), D))

    params0 = icnf.init(jax.random.PRNGKey(0))
    bpd_init = bpd_of(params0)
    result = model.fit(x, params=params0)
    bpd_final = bpd_of(result.params)
    return icnf, result.params, true_bpd, bpd_init, bpd_final


def test_bits_per_dim_converges(image_fit):
    _icnf, _params, true_bpd, bpd_init, bpd_final = image_fit
    gap_init = bpd_init - true_bpd
    gap_final = bpd_final - true_bpd
    # measured on this config (benchmarks/image_bitsdim.py --side 8): init
    # gap 3.31, curve 200/400/600 steps -> 0.45/0.32/0.27; thresholds leave
    # ~1.5x headroom on the final and would catch the round-2 overfitting
    # regression (which ran the eval gap to 1.8)
    assert gap_init > 1.5, (bpd_init, true_bpd)  # task is actually nontrivial
    assert gap_final < 0.40, (bpd_final, true_bpd)
    assert gap_final < 0.15 * gap_init, (gap_final, gap_init)


def test_generated_images_match_moments(image_fit):
    """Samples from the fitted flow must land in the data's moment range —
    the generate() direction at image scale."""
    icnf, params, _t, _bi, _bf = image_fit
    gen = cnf.generate(icnf, Mode.TEST, params, jax.random.PRNGKey(9), 512)
    x = datasets.smooth_image_mixture(jax.random.PRNGKey(9), 2048, SIDE, 3)
    assert gen.shape == (512, D)
    assert np.isfinite(np.asarray(gen)).all()
    assert abs(float(gen.mean()) - float(x.mean())) < 0.4
    assert abs(float(gen.std()) - float(x.std())) < 0.6
