"""A/B the sampling (generate / ICNFDist.rand) path: full augmented system
vs the trace-free fast path (``generate(..., trace_free=True)``).

The reference's ``generate_prob`` always integrates the full augmented ODE
(base_icnf.jl:298-404) even though the accumulator states never feed back
into the flow; the trace-free path integrates the bare field only.  Measures
samples/s (scan of STEPS dispatches, best of 3) and max sample deviation
(same key → same base draw, differences are solver-tolerance only).

    python benchmarks/sample_ab.py [--batch 4096] [--nvariables 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import continuousnormalizingflows_tpu as cnf
from continuousnormalizingflows_tpu.config import Mode, SolverConfig
from continuousnormalizingflows_tpu.utils import datasets

STEPS = 10


def _data(key, n, nvariables):
    k1, k2 = jax.random.split(key)
    x2 = datasets.gaussian_mixture(k1, n)
    if nvariables == 2:
        return x2
    rest = 0.5 * jax.random.normal(k2, (n, nvariables - 2))
    return jnp.concatenate([x2, rest + 0.3 * x2[:, :1]], axis=1)


def train_field(nvariables, iters, batch):
    # train with the rk4-backprop config (the abm_ab recipe — adjoint training
    # at d=2 with adam 1e-3 can diverge); params transfer to any solver config
    icnf = cnf.ICNF.create(
        nvariables=nvariables,
        solver=SolverConfig(method="rk4", gradient="backprop", fixed_steps=32),
    )
    params = icnf.init(jax.random.PRNGKey(0))
    x = _data(jax.random.PRNGKey(1), batch, nvariables)
    opt = optax.adam(1e-3)

    @jax.jit
    def run(params, opt_state, key):
        def step(carry, i):
            params, opt_state, key = carry
            key, k = jax.random.split(key)
            l, g = jax.value_and_grad(
                lambda p: cnf.loss(icnf, Mode.TRAIN, x, p, key=k)
            )(params)
            updates, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(params, updates), opt_state, key), l

        (params, _, _), ls = jax.lax.scan(
            step, (params, opt_state, key), jnp.arange(iters)
        )
        return params, ls[-1]

    params, l = run(params, opt.init(params), jax.random.PRNGKey(7))
    jax.block_until_ready(l)
    print(f"trained field (d={nvariables}): loss {float(l):.4f}", flush=True)
    return params


def bench(icnf, params, mode, n, trace_free):
    @jax.jit
    def run(key):
        def body(carry, i):
            s = cnf.generate(icnf, mode, params, jax.random.fold_in(key, i), n,
                             trace_free=trace_free)
            return carry, s

        _, ss = jax.lax.scan(body, 0, jnp.arange(STEPS))
        return ss[-1]

    t_c = time.perf_counter()
    s = run(jax.random.PRNGKey(42))
    jax.block_until_ready(s)
    tag = f"{mode.value} trace_free={trace_free}"
    print(f"  [{tag}] compile+first: {time.perf_counter()-t_c:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = run(jax.random.PRNGKey(42))
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"  [{tag}] {best*1e3:.2f} ms/solve  {n/best/1e6:.3f} M samples/s",
          flush=True)
    return best, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--nvariables", type=int, default=2)
    ap.add_argument("--train-iters", type=int, default=300)
    args = ap.parse_args()
    print("device:", jax.devices()[0], "d =", args.nvariables, flush=True)

    icnf = cnf.ICNF.create(
        nvariables=args.nvariables,
        solver=SolverConfig(method="dopri5", rtol=1e-4, atol=1e-4),
    )
    params = train_field(args.nvariables, args.train_iters, args.batch)

    for mode in (Mode.TEST, Mode.TRAIN):
        t_full, s_full = bench(icnf, params, mode, args.batch, False)
        t_fast, s_fast = bench(icnf, params, mode, args.batch, True)
        dev = float(jnp.max(jnp.abs(s_full - s_fast)))
        print(f"{mode.value}: trace-free speedup {t_full/t_fast:.2f}x, "
              f"max sample |Δ| {dev:.2e}", flush=True)


if __name__ == "__main__":
    main()
