"""Benchmark harness — prints ONE JSON line for the driver.

Flagship config (BASELINE.md config 1): 2-D ring-of-Gaussians RNODE with
Hutchinson-VJP trace, reference-default hyperparameters, measuring

* ``train_samples_per_sec_per_chip`` — full train step (loss + grad + Adam)
  throughput, and
* NFE-normalized log-prob evals/s on the TestMode exact-trace path
  (reported in the auxiliary fields).

``vs_baseline``: the reference publishes no absolute numbers (BASELINE.md), so
the anchor is this repo's first recorded TPU measurement, persisted to
``BASELINE_LOCAL.json`` on first run; later rounds report their speedup
against it.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import optax

import continuousnormalizingflows_tpu as cnf
from continuousnormalizingflows_tpu.config import Mode, SolverConfig
from continuousnormalizingflows_tpu.utils import datasets

BATCH = 65536  # measured throughput peak on v5e (batch sweep: 4k/16k/64k/256k)
EVAL_BATCH = 4096
TRAIN_STEPS = 20
ANCHOR_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_LOCAL.json")


def bench_train(icnf, params, x):
    """Time TRAIN_STEPS optimizer steps executed as ONE device program.

    The whole timed window is a single jitted ``lax.scan`` — this VM has
    multi-minute host I/O stall phases (CLAUDE.md), so any Python-loop timing
    can be polluted by the host; a single dispatch measures pure device time.
    Three reps, best-of (a stall can still land between dispatch and ready).
    """
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def step(carry, i):
        params, opt_state, key = carry
        key, k = jax.random.split(key)
        (l, stats), grads = jax.value_and_grad(
            lambda p: cnf.loss_with_stats(icnf, Mode.TRAIN, x, p, key=k),
            has_aux=True,
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state, key), (
            l, stats.nfe,
        )

    @jax.jit
    def run(params, opt_state, key):
        (params, opt_state, _key), (losses, nfes) = jax.lax.scan(
            step, (params, opt_state, key), jnp.arange(TRAIN_STEPS)
        )
        return params, opt_state, losses[-1], nfes[-1]

    key = jax.random.PRNGKey(0)
    # warmup/compile
    _p, _o, l, nfe = run(params, opt_state, key)
    jax.block_until_ready(l)
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        _p, _o, l, nfe = run(params, opt_state, jax.random.PRNGKey(rep))
        jax.block_until_ready(l)
        best = min(best, (time.perf_counter() - t0) / TRAIN_STEPS)
    # the forward-solve NFE of the LAST step — attribution aux: a throughput
    # drift with unchanged NFE is dispatch/kernel time, with changed NFE it
    # is solver behavior (VERDICT round-3 Weak #3)
    return BATCH / best, float(l), int(nfe)


def bench_eval(icnf_eval, params, x):
    reps = 5

    @jax.jit
    def ev(params):
        def body(carry, _):
            lp, _augs, stats = cnf.inference(icnf_eval, Mode.TEST, x, params)
            return carry, (lp[0], stats.nfe)

        _, (lps, nfes) = jax.lax.scan(body, 0, jnp.arange(reps))
        return lps, nfes

    lps, nfes = ev(params)
    jax.block_until_ready(lps)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        lps, nfes = ev(params)
        jax.block_until_ready(lps)
        best = min(best, (time.perf_counter() - t0) / reps)
    nfe = int(nfes[-1])
    n = x.shape[0]
    return n / best, nfe, n * nfe / best


def main():
    # train path: fixed-step + bf16 MXU passes (measured 2.2x over fp32 with
    # negligible effect on the optimized loss — stochastic-trace noise
    # dominates); eval path: fp32 + adaptive 1e-4 (reference tolerances) for
    # density parity.
    icnf = cnf.ICNF.create(
        nvariables=2,
        solver=SolverConfig(method="rk4", gradient="backprop", fixed_steps=32),
        precision="default",
    )
    # reference-parity train path: adaptive dopri5 at the reference tolerances
    # + continuous adjoint + f32-highest MXU (both paths are gated so the
    # headline cannot quietly optimize only the easy fixed-step/bf16 path)
    # dt0 pinned to the fixed 0.01 start: the metric tracks solver/step
    # throughput across rounds against an anchor recorded with this start;
    # the round-3 dt0="auto" default (HNW starting step) helps TRAINED
    # fields (NFE 25→20) but costs its +1 probe eval on the near-untrained
    # 20-step field benched here — pinning keeps the trend comparable.
    icnf_ref = cnf.ICNF.create(
        nvariables=2,
        solver=SolverConfig(method="dopri5", rtol=1e-4, atol=1e-4,
                            gradient="adjoint", dt0=0.01),
        precision="highest",
    )
    icnf_eval = cnf.ICNF.create(
        nvariables=2,
        solver=SolverConfig(method="dopri5", rtol=1e-4, atol=1e-4, dt0=0.01),
        precision="highest",
    )
    # the reference's DEFAULT sensitivity stack, solver-class-for-class:
    # VCABM + QuadratureAdjoint (icnf.jl:89-99) = abm + interpolation
    # quadrature adjoint here (measured the right pairing on TPU: 1.56x over
    # abm+backsolve, PARITY round 3) — the chip-side sentinel beyond the two
    # gated paths above (VERDICT round-3 item 8)
    icnf_abm = cnf.ICNF.create(
        nvariables=2,
        solver=SolverConfig(method="abm", rtol=1e-4, atol=1e-4,
                            gradient="quadrature"),
        precision="highest",
    )
    params = icnf.init(jax.random.PRNGKey(0))
    x = datasets.gaussian_mixture(jax.random.PRNGKey(1), BATCH)

    train_sps, final_loss, _nfe_fixed = bench_train(icnf, params, x)
    ref_sps, _ref_loss, ref_nfe = bench_train(icnf_ref, params, x)
    abm_sps, _abm_loss, abm_nfe = bench_train(icnf_abm, params, x)
    eval_sps, nfe, dyn_evals_ps = bench_eval(
        icnf_eval, params, datasets.gaussian_mixture(jax.random.PRNGKey(2), EVAL_BATCH)
    )

    anchors = {}
    if os.path.exists(ANCHOR_FILE):
        with open(ANCHOR_FILE) as f:
            anchors = json.load(f)
    anchor = anchors.get("train_samples_per_sec_per_chip")
    anchor_ref = anchors.get("train_adaptive_fp32_samples_per_sec")
    anchor_abm = anchors.get("train_abm_quadrature_samples_per_sec")
    dirty = False
    if not anchor:
        anchors["train_samples_per_sec_per_chip"] = anchor = train_sps
        anchors.setdefault(
            "note", "round-1 TPU anchor (reference publishes no numbers)"
        )
        dirty = True
    if not anchor_ref:
        # first run after the adaptive path became gated: record its anchor
        anchors["train_adaptive_fp32_samples_per_sec"] = anchor_ref = ref_sps
        dirty = True
    if not anchor_abm:
        # round-4 sentinel: the reference's default stack pairing
        anchors["train_abm_quadrature_samples_per_sec"] = anchor_abm = abm_sps
        anchors["train_abm_quadrature_round"] = 4
        dirty = True
    if dirty:
        with open(ANCHOR_FILE, "w") as f:
            json.dump(anchors, f)

    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_per_chip",
                "value": round(train_sps, 1),
                "unit": "samples/s/chip",
                "vs_baseline": round(train_sps / anchor, 3),
                "aux": {
                    "train_adaptive_fp32_samples_per_sec": round(ref_sps, 1),
                    "adaptive_fp32_vs_baseline": round(ref_sps / anchor_ref, 3),
                    "train_adaptive_nfe": ref_nfe,
                    "train_abm_quadrature_samples_per_sec": round(abm_sps, 1),
                    "abm_quadrature_vs_baseline": round(abm_sps / anchor_abm, 3),
                    "train_abm_nfe": abm_nfe,
                    "testmode_logprob_evals_per_sec": round(eval_sps, 1),
                    "testmode_nfe": nfe,
                    "dynamics_evals_per_sec": round(dyn_evals_ps, 1),
                    "train_loss": round(final_loss, 4),
                    "batch": BATCH,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
