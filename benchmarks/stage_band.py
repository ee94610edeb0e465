"""Per-stage fused dynamics kernel vs XLA at tabular/image hidden widths.

Round-1 gap (ROADMAP item 1): the per-stage backward VMEM-OOMed at h=1024;
the kernels now budget their batch tile against VMEM (pallas_kernels
_stage_tile), so the wide band is measurable.  This times one fused
forward+backward (the f-eval that dominates wide-net training) against the
pure-XLA chain, value+grad, scan-timed.

    python benchmarks/stage_band.py [--batch 4096]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from continuousnormalizingflows_tpu.models.nets import MLP
from continuousnormalizingflows_tpu.ops.pallas_kernels import (
    fused_dynamics_vjp,
    mlp3_forward_vjp_reference,
)

REPS = 20


def bench(h: int, batch: int, nz: int, cdt, use_kernel: bool):
    n_in = nz + 1
    net = MLP((n_in, h, h, nz))
    params = net.init(jax.random.PRNGKey(0))
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (batch, n_in))
    eps = jax.random.normal(jax.random.PRNGKey(2), (batch, nz))

    def loss(p, xi):
        if use_kernel:
            y, ez, div, rz, rj = fused_dynamics_vjp(xi, eps, p, nz, 256, cdt)
        else:
            y, ez, div, rz, rj = mlp3_forward_vjp_reference(xi, eps, p, nz)
        return jnp.sum(y * y) + jnp.sum(ez) + jnp.sum(div) + jnp.sum(rz + rj)

    @jax.jit
    def run(p, x0):
        def body(carry, i):
            l, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(p, x0 + 1e-6 * i)
            return carry + l, gx[0, 0]

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(REPS, dtype=jnp.float32))
        return acc

    # f32 rows compare like-for-like: the XLA side must also run
    # float32-accurate MXU passes (TPU default is bf16 passes)
    with jax.default_matmul_precision("highest" if cdt is None else "default"):
        t0 = time.perf_counter()
        out = run(params, x)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(params, x)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / REPS)
    return best, compile_s, float(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--nz", type=int, default=784)
    args = ap.parse_args()
    print("device:", jax.devices()[0], flush=True)

    for h in (512, 1024):
        for cdt, name in ((jnp.bfloat16, "bf16"), (None, "f32")):
            try:
                t_x, c_x, l_x = bench(h, args.batch, args.nz, cdt, use_kernel=False)
                t_k, c_k, l_k = bench(h, args.batch, args.nz, cdt, use_kernel=True)
            except Exception as e:  # keep sweeping; a Mosaic fail IS a result
                print(f"h={h:5d} {name}: FAILED — {str(e)[:100]}", flush=True)
                continue
            print(
                f"h={h:5d} {name}: XLA {t_x*1e3:7.2f} ms | kernel {t_k*1e3:7.2f} ms"
                f" | ratio {t_x/t_k:5.2f}x | loss Δ {abs(l_x-l_k):.3e}"
                f" | compile {c_x:.0f}/{c_k:.0f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
