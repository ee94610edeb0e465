"""Real-data tabular density estimation (BASELINE config-4 class, real data).

The flow literature benchmarks tabular density estimation on UCI tables
(POWER/GAS/...; unavailable offline) — sklearn's bundled *real* tables
(wine 178x13, breast_cancer 569x30, diabetes 442x9 raw clinical
measurements) are the in-image stand-ins, exactly as sklearn digits stands
in for MNIST (ROADMAP round 3).  Protocol (standard
for tabular flows): z-score standardize on train stats, add small
dequantization jitter (both tables have repeated/discretized measurement
values — a continuous density on exact duplicates diverges), 80/20 split,
report mean test NLL (nats) vs two Gaussian MLE baselines fit on the same
train split:

* ``diag``  — independent Gaussians (the floor any density learner must beat)
* ``full``  — full-covariance Gaussian (a strong linear baseline at n << d²)

A flow beating the FULL-covariance Gaussian on held-out data demonstrates
real nonlinear density learning on real measurements.

Run: python benchmarks/tabular_real.py               (TPU)
     python benchmarks/tabular_real.py --cpu --epochs 150
(--cpu forces the CPU backend in-process — a JAX_PLATFORMS=cpu shell prefix
is silently clobbered by the axon sitecustomize, CLAUDE.md)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--cpu" in sys.argv:  # must precede backend init (axon sitecustomize gotcha)
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
import numpy as np

import continuousnormalizingflows_tpu as cnf
from continuousnormalizingflows_tpu.config import Mode, SolverConfig
from continuousnormalizingflows_tpu.models.nets import MLP
from continuousnormalizingflows_tpu.utils.datasets import load_tabular_real

FAST = SolverConfig(method="rk4", gradient="backprop", fixed_steps=24)
EVAL = SolverConfig(method="dopri5", rtol=1e-4, atol=1e-4)


def gaussian_baselines(xtr, xte):
    mu = xtr.mean(0)
    var = xtr.var(0) + 1e-6
    d = xtr.shape[1]
    nll_diag = float(np.mean(
        0.5 * (np.log(2 * np.pi * var) + (xte - mu) ** 2 / var).sum(-1)
    ))
    cov = np.cov(xtr, rowvar=False) + 1e-4 * np.eye(d)
    sign, logdet = np.linalg.slogdet(cov)
    sol = np.linalg.solve(cov, (xte - mu).T).T
    nll_full = float(np.mean(
        0.5 * (d * np.log(2 * np.pi) + logdet + ((xte - mu) * sol).sum(-1))
    ))
    return nll_diag, nll_full


def run(name, epochs, h, lam, seed=0, eval_every=100, patience=3):
    """Validated fit via the SUPPORTED estimator API (round 5; the round-4
    hand-rolled chunk loop this replaces measured the protocol as necessary:
    at n ~ 10² rows a flow memorizes in thousands of full-batch steps — wine
    400 epochs test-NLL 16.4 but 3000 epochs 827).  20% of the train split is
    held out for validation; ``fit(validation_data=..., eval_every=...,
    patience=...)`` evaluates TestMode val NLL on the adaptive eval solver
    (``eval_icnf``), tracks best-val params, and stops early; test NLL is
    reported at ``FitResult.best_params``."""
    import dataclasses

    xtr_all, xte = load_tabular_real(name, seed=seed)
    n_val = max(1, int(0.2 * xtr_all.shape[0]))
    xval, xtr = xtr_all[:n_val], xtr_all[n_val:]
    d = xtr.shape[1]
    nll_diag, nll_full = gaussian_baselines(np.asarray(xtr), np.asarray(xte))

    icnf = cnf.ICNF.create(
        nvariables=d, naugments=0, lambda_3=0.0, steer_rate=0.0,
        lambda_1=lam, lambda_2=lam, solver=FAST,
    )
    net = MLP((icnf.config.n_in, h, h, icnf.config.n_out),
              dtype=icnf.config.dtype, precision="highest")
    icnf = cnf.ICNF(config=icnf.config, net=net)
    icnf_eval = cnf.ICNF(config=dataclasses.replace(icnf.config, solver=EVAL),
                         net=net)

    model = cnf.ICNFModel(icnf, eval_icnf=icnf_eval, batchsize=0,
                          epochs=epochs, key=jax.random.PRNGKey(seed + 1))
    res = model.fit(xtr, validation_data=xval, eval_every=eval_every,
                    patience=patience)
    if res.best_params is None:
        raise RuntimeError(
            f"{name}: validation NLL was non-finite at every evaluation "
            f"(diverged fit) — nothing to report"
        )

    # one TestMode solve yields both the NLL and the solver stats
    lp, _, stats = cnf.inference(icnf_eval, Mode.TEST, xte, res.best_params)
    nll_flow = -float(jnp.mean(lp))
    out = {
        "dataset": name, "d": d, "n_train": int(xtr.shape[0]),
        "n_val": int(xval.shape[0]), "n_test": int(xte.shape[0]),
        "best_epoch": res.best_epoch, "epochs_run": res.stats["epochs_run"],
        "h": h,
        "nll_flow": round(nll_flow, 3), "nll_val": round(res.best_val_nll, 3),
        "nll_gauss_full": round(nll_full, 3),
        "nll_gauss_diag": round(nll_diag, 3),
        "beats_full_gaussian": bool(nll_flow < nll_full),
        "eval_nfe": int(stats.nfe),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--datasets", nargs="*",
                    default=["wine", "breast_cancer", "diabetes"])
    args = ap.parse_args()
    cfgs = {"wine": dict(h=64, lam=0.01),
            "breast_cancer": dict(h=128, lam=0.01),
            "diabetes": dict(h=64, lam=0.01)}
    for name in args.datasets:
        run(name, args.epochs, **cfgs[name])
