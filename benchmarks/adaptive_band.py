"""Adaptive whole-solve Pallas kernel vs the XLA dopri5 + backsolve-adjoint
path (ROADMAP item 3).  Both sides run the reference-default adaptive TRAIN
configuration (dopri5, rtol = atol = 1e-4, fp32) — the fused kernel replaces
the continuous adjoint with in-VMEM exact discrete BPTT and runs per-tile
step control (fewer NFE on tiles without the worst-case sample).

    python benchmarks/adaptive_band.py            # real TPU

Expected from the fixed-step data (PARITY.md): the h≈128 band is where the
whole-solve residency pays (fixed kernel: 2.3x over fp32 XLA); the tiny
default net stays on XLA.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import continuousnormalizingflows_tpu as cnf
from continuousnormalizingflows_tpu.config import ICNFConfig, Mode, SolverConfig
from continuousnormalizingflows_tpu.models.nets import MLP

STEPS_TIMED = 10


def bench_case(nvars: int, h: int, batch: int, fused: bool):
    cfg = ICNFConfig(
        nvariables=nvars,
        solver=SolverConfig(method="dopri5", rtol=1e-4, atol=1e-4,
                            gradient="adjoint"),
        fused=fused, fused_adaptive=fused,
    )
    net = MLP((cfg.n_in, h, h, cfg.n_out), precision="highest")
    icnf = cnf.ICNF(config=cfg, net=net)
    params = icnf.init(jax.random.PRNGKey(0))
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (batch, nvars))

    # timing at FIXED params (fresh probe per step, no optimizer update):
    # constant NFE per step, so both sides time the same work.  Training
    # THROUGH the fused kernel is measured separately (see PARITY.md: the
    # per-tile controller resolves sample-local stiffness the 65k-sample
    # global RMS norm dilutes, which changes training trajectories).
    def step(carry, _):
        params, key = carry
        key, k = jax.random.split(key)
        l, _grads = jax.value_and_grad(
            lambda p: cnf.loss(icnf, Mode.TRAIN, x, p, key=k)
        )(params)
        return (params, key), l

    @jax.jit
    def run(params, key):
        (params, _), losses = jax.lax.scan(
            step, (params, key), jnp.arange(STEPS_TIMED)
        )
        return losses[-1]

    t_c = time.perf_counter()
    l = run(params, jax.random.PRNGKey(0))
    jax.block_until_ready(l)
    compile_s = time.perf_counter() - t_c

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        l = run(params, jax.random.PRNGKey(0))
        jax.block_until_ready(l)
        best = min(best, (time.perf_counter() - t0) / STEPS_TIMED)
    # per-solve stats for the same config (one inference dispatch)
    _lp, _augs, stats = cnf.inference(
        icnf, Mode.TRAIN, x, params, key=jax.random.PRNGKey(2)
    )
    return float(l), best, compile_s, int(stats.nfe)


def main():
    print("device:", jax.devices()[0], flush=True)
    cases = [
        ("tiny d=2 h=24", 2, 24, 65536),
        ("h=128 d=20", 20, 128, 16384),
        ("h=128 d=20 b=64k", 20, 128, 65536),
    ]
    for name, nvars, h, batch in cases:
        l_x, t_x, c_x, nfe_x = bench_case(nvars, h, batch, fused=False)
        print(f"[{name}] XLA   : {t_x*1e3:8.2f} ms/step  loss {l_x:.4f} "
              f"NFE {nfe_x}  (compile {c_x:.0f}s)", flush=True)
        l_f, t_f, c_f, nfe_f = bench_case(nvars, h, batch, fused=True)
        print(f"[{name}] fused : {t_f*1e3:8.2f} ms/step  loss {l_f:.4f} "
              f"NFE {nfe_f}  (compile {c_f:.0f}s)  -> {t_x/t_f:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
