"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors the reference's CI strategy of exercising the full API sweep on CPU
(reference ``test/runtests.jl:41``), with the 8 virtual devices standing in
for a TPU slice so sharding paths compile and execute without hardware
(SURVEY.md §4).

The driver environment exports ``JAX_PLATFORMS=axon`` (a real-TPU tunnel) and
installed pytest plugins (jaxtyping) import jax before this conftest runs, so
plain env-var edits are not reliable — use jax.config updates, which work any
time before backend initialization, and hard-fail if some plugin already
initialized a non-CPU backend (tests on the tunneled TPU are pathologically
slow and run at bf16 matmul precision, breaking tolerance-based assertions).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", (
    "JAX initialized a non-CPU backend before conftest could force CPU; "
    f"got {jax.devices()}"
)
assert len(jax.devices()) == 8, f"expected 8 virtual CPU devices, got {jax.devices()}"
