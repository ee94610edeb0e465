"""Real-data tabular density estimation (BASELINE config-4 class, real data).

The flow literature benchmarks tabular density estimation on UCI tables
(POWER/GAS/...; unavailable offline) — sklearn's bundled *real* UCI tables
(wine 178x13, breast_cancer 569x30) are the in-image stand-ins, exactly as
sklearn digits stands in for MNIST (ROADMAP round 3).  Protocol (standard
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


def run(name, epochs, h, lam, seed=0, chunk_epochs=100, patience=3):
    """Chunked fit with validation early stopping (the standard UCI-tabular
    protocol at n ~ 10² where a flow memorizes in thousands of full-batch
    steps: measured on wine, 400 epochs test-NLL 16.4 but 3000 epochs 827 —
    catastrophic overfit).  20% of the train split is held out for
    validation; training warm-starts chunk to chunk through ONE compiled
    step (the round-3 resume machinery) and stops after ``patience`` chunks
    without a validation improvement; test NLL is reported at the best-val
    params."""
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

    # honor --epochs exactly: full chunks plus a remainder chunk (each
    # distinct chunk length is one extra step-compile via its own model;
    # warm-start keeps training state continuous across them)
    n_full, rem = divmod(epochs, chunk_epochs)
    schedule = [chunk_epochs] * n_full + ([rem] if rem else [])
    models = {}
    params = opt_state = key = None
    best = {"val": float("inf"), "params": None, "epoch": 0}
    done_epochs = 0
    stale = 0
    for ce in schedule:
        if ce not in models:
            models[ce] = cnf.ICNFModel(icnf, batchsize=0, epochs=ce,
                                       key=jax.random.PRNGKey(seed + 1))
        res = models[ce].fit(xtr, params=params, opt_state=opt_state, key=key)
        params, opt_state, key = res.params, res.opt_state, res.key
        done_epochs += ce
        lp_val, _, _ = cnf.inference(icnf_eval, Mode.TEST, xval, params)
        val = -float(jnp.mean(lp_val))
        if val < best["val"]:
            best = {"val": val, "params": params, "epoch": done_epochs}
            stale = 0
        else:
            stale += 1
            if stale >= patience:
                break
    if best["params"] is None:
        raise RuntimeError(
            f"{name}: validation NLL was non-finite in every chunk "
            f"(diverged fit) — nothing to report"
        )

    lp, _, stats = cnf.inference(icnf_eval, Mode.TEST, xte, best["params"])
    nll_flow = -float(jnp.mean(lp))
    out = {
        "dataset": name, "d": d, "n_train": int(xtr.shape[0]),
        "n_val": int(xval.shape[0]), "n_test": int(xte.shape[0]),
        "best_epoch": best["epoch"], "h": h,
        "nll_flow": round(nll_flow, 3), "nll_val": round(best["val"], 3),
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
    args = ap.parse_args()
    run("wine", args.epochs, h=64, lam=0.01)
    run("breast_cancer", args.epochs, h=128, lam=0.01)
