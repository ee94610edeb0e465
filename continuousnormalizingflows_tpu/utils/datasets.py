"""Toy data generators used by tests, benchmarks, and examples.

Covers the data configurations referenced by the baselines (BASELINE.md):
1-D Beta(2,4) (reference test/ci_tests/regression_tests.jl:2-6), 2-D Gaussian
mixtures (examples/usage.jl style), and the two-moons / circles 2-D toy suite.
Everything is generated with ``jax.random`` — no sklearn dependency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["beta_samples", "beta_pdf", "gaussian_mixture", "gaussian_mixture_logpdf", "two_moons", "circles"]


def beta_samples(key: jax.Array, n: int, a: float = 2.0, b: float = 4.0, ndim: int = 1) -> jax.Array:
    """(n, ndim) i.i.d. Beta(a, b) samples — the reference regression config."""
    return jax.random.beta(key, a, b, (n, ndim), jnp.float32)


def beta_pdf(x: jax.Array, a: float = 2.0, b: float = 4.0) -> jax.Array:
    """Beta(a, b) pdf evaluated elementwise (ground truth for parity checks)."""
    from jax.scipy.special import betaln

    x = jnp.clip(x, 1e-12, 1.0 - 1e-12)
    logpdf = (a - 1) * jnp.log(x) + (b - 1) * jnp.log1p(-x) - betaln(a, b)
    return jnp.exp(logpdf)


def _ring_means(k: int, radius: float) -> jax.Array:
    ang = jnp.arange(k) * (2 * jnp.pi / k)
    return radius * jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def gaussian_mixture(
    key: jax.Array, n: int, k: int = 8, radius: float = 2.0, std: float = 0.3
) -> jax.Array:
    """(n, 2) samples from a k-mode ring-of-Gaussians mixture."""
    k_comp, k_noise = jax.random.split(key)
    means = _ring_means(k, radius)
    comp = jax.random.randint(k_comp, (n,), 0, k)
    return means[comp] + std * jax.random.normal(k_noise, (n, 2))


def gaussian_mixture_logpdf(
    x: jax.Array, k: int = 8, radius: float = 2.0, std: float = 0.3
) -> jax.Array:
    means = _ring_means(k, radius)
    d2 = jnp.sum(jnp.square(x[..., None, :] - means), axis=-1)  # (..., k)
    comp_logp = -0.5 * d2 / std**2 - jnp.log(2 * jnp.pi * std**2)
    return jax.nn.logsumexp(comp_logp, axis=-1) - jnp.log(k)


def two_moons(key: jax.Array, n: int, noise: float = 0.08) -> jax.Array:
    """(n, 2) two-interleaving-moons samples."""
    k_side, k_ang, k_noise = jax.random.split(key, 3)
    side = jax.random.bernoulli(k_side, 0.5, (n,))
    theta = jax.random.uniform(k_ang, (n,), minval=0.0, maxval=jnp.pi)
    x = jnp.where(side, jnp.cos(theta), 1.0 - jnp.cos(theta))
    y = jnp.where(side, jnp.sin(theta), 0.5 - jnp.sin(theta))
    pts = jnp.stack([x, y], axis=-1)
    return pts + noise * jax.random.normal(k_noise, (n, 2))


def circles(key: jax.Array, n: int, factor: float = 0.5, noise: float = 0.05) -> jax.Array:
    """(n, 2) two-concentric-circles samples."""
    k_side, k_ang, k_noise = jax.random.split(key, 3)
    side = jax.random.bernoulli(k_side, 0.5, (n,))
    theta = jax.random.uniform(k_ang, (n,), minval=0.0, maxval=2 * jnp.pi)
    r = jnp.where(side, 1.0, factor)
    pts = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return pts + noise * jax.random.normal(k_noise, (n, 2))
