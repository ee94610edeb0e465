"""Distribution facade: a fitted ICNF as a probability distribution.

Re-design of the reference Distributions.jl extension
(``src/exts/dist_ext/``): ``ICNFDist`` / ``CondICNFDist`` expose
``logpdf`` / ``pdf`` / ``sample`` over a model + fitted params, so downstream
code can treat the flow like any density object (the reference gets
``pdf``/``logpdf``/``rand`` for free from ``Distributions._logpdf`` /
``_rand!``, dist_ext/core_icnf.jl:13-75).

Shape handling mirrors the reference's cross-mode shims (vector-vs-matrix
reshape, dist_ext/core_icnf.jl:22-41): a single ``(d,)`` sample returns a
scalar, a ``(n, d)`` batch returns ``(n,)``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from .config import Mode
from .core import generate, inference
from .models.icnf import ICNF

__all__ = ["ICNFDist", "CondICNFDist"]

Pytree = Any


class ICNFDist:
    """Unconditional flow distribution (reference ``ICNFDist``)."""

    def __init__(
        self,
        icnf: ICNF,
        params: Pytree,
        mode: Mode = Mode.TEST,
        key: Optional[jax.Array] = None,
    ) -> None:
        self.icnf = icnf
        self.params = params
        self.mode = mode
        # train-mode logpdf needs probe randomness; keep a counter-split key
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def __len__(self) -> int:
        return self.icnf.config.nvariables

    def _next_key(self) -> jax.Array:
        self._key, k = jax.random.split(self._key)
        return k

    def _ys_for(self, n: int):
        return None

    def logpdf(self, x: jax.Array) -> jax.Array:
        key = self._next_key() if self.mode is Mode.TRAIN else None
        x = jnp.asarray(x, self.icnf.config.dtype)
        ys = self._ys_for(x.shape[0] if x.ndim > 1 else 1)
        logpx, _augs, _nfe = inference(self.icnf, self.mode, x, self.params, key=key, ys=ys)
        return logpx

    def pdf(self, x: jax.Array) -> jax.Array:
        return jnp.exp(self.logpdf(x))

    def sample(self, key: jax.Array, n: int) -> jax.Array:
        """(n, nvariables) samples (reference ``_rand!`` = generate)."""
        return generate(self.icnf, self.mode, self.params, key, n, ys=self._ys_for(n))

    # numpy-style alias matching Distributions.rand(d, n)
    rand = sample


class CondICNFDist(ICNFDist):
    """Conditional flow distribution at fixed conditions ``ys`` (reference
    ``CondICNFDist``; ys truncated/broadcast to the query batch width,
    dist_ext/core_cond_icnf.jl:45,79)."""

    def __init__(
        self,
        icnf: ICNF,
        params: Pytree,
        ys: jax.Array,
        mode: Mode = Mode.TEST,
        key: Optional[jax.Array] = None,
    ) -> None:
        super().__init__(icnf, params, mode, key)
        ys = jnp.asarray(ys, icnf.config.dtype)
        if ys.ndim == 1:
            ys = ys[None, :]
        self.ys = ys

    def _ys_for(self, n: int):
        if self.ys.shape[0] == n:
            return self.ys
        if self.ys.shape[0] == 1:
            return jnp.broadcast_to(self.ys, (n, self.ys.shape[1]))
        return self.ys[:n]
