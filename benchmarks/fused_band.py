"""Whole-solve fused kernel vs XLA across hidden widths (the kernel's
winning band).  Measured round 1: wins at h=128 (1.17x bf16 / 2.3x fp32),
loses at the tiny default h=24.  This sweep covers the widened multi-tile
band (h up to 512), including BASELINE config 4's tabular shape
(43-d → h=176).  Run on the real TPU:

    python benchmarks/fused_band.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import continuousnormalizingflows_tpu as cnf
from continuousnormalizingflows_tpu.config import ICNFConfig, Mode, SolverConfig
from continuousnormalizingflows_tpu.models.nets import MLP

STEPS_TIMED = 10


def bench_case(nvars: int, h: int, batch: int, fused: bool, precision: str):
    cfg = ICNFConfig(
        nvariables=nvars,
        solver=SolverConfig(method="rk4", gradient="backprop", fixed_steps=32),
        fused=fused,
    )
    net = MLP((cfg.n_in, h, h, cfg.n_out), precision=precision)
    icnf = cnf.ICNF(config=cfg, net=net)
    params = icnf.init(jax.random.PRNGKey(0))
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (batch, nvars))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def step(carry, _):
        params, opt_state, key = carry
        key, k = jax.random.split(key)
        l, grads = jax.value_and_grad(
            lambda p: cnf.loss(icnf, Mode.TRAIN, x, p, key=k)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state, key), l

    @jax.jit
    def run(params, opt_state, key):
        (params, opt_state, _), losses = jax.lax.scan(
            step, (params, opt_state, key), jnp.arange(STEPS_TIMED)
        )
        return losses[-1]

    t_c = time.perf_counter()
    l = run(params, opt_state, jax.random.PRNGKey(0))
    jax.block_until_ready(l)
    compile_s = time.perf_counter() - t_c
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        l = run(params, opt_state, jax.random.PRNGKey(rep))
        jax.block_until_ready(l)
        best = min(best, (time.perf_counter() - t0) / STEPS_TIMED)
    tag = "fused" if fused else "xla  "
    print(f"  h={h:4d} {tag} {precision:7s}: {best*1e3:7.2f} ms/step "
          f"loss={float(l):9.4f} (compile {compile_s:.0f}s)", flush=True)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)
    # (nvars, h, batch): h=4*n_in reference sizing; batch scaled to keep work even
    cases = [(15, 128, 16384), (43, 176, 8192), (30, 256, 8192)]
    for nvars, h, batch in cases:
        print(f"case nvars={nvars} h={h} batch={batch}", flush=True)
        for precision in ("default",):
            t_x = bench_case(nvars, h, batch, False, precision)
            t_f = bench_case(nvars, h, batch, True, precision)
            print(f"  -> speedup fused/xla: {t_x/t_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
