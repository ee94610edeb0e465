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

import warnings
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .config import Mode
from .core import generate, inference
from .models.icnf import ICNF

__all__ = ["ICNFDist", "CondICNFDist"]

Pytree = Any

_warned_transpose = False


def _shim_layout(x: jax.Array, nvariables: int) -> jax.Array:
    """One-shot-warn layout shim — the analogue of the reference's
    cross-mode reshape warnings (``@warn maxlog=1``,
    dist_ext/core_icnf.jl:22-41): a ``(nvariables, n)`` features-first batch
    (the reference's native Julia layout) is transposed to the batch-first
    convention here, with a warning the first time."""
    global _warned_transpose
    if (
        x.ndim == 2
        and x.shape[1] != nvariables
        and x.shape[0] == nvariables
    ):
        if not _warned_transpose:
            warnings.warn(
                f"input looks features-first {x.shape}; transposing to the "
                f"batch-first (n, {nvariables}) convention (warned once)",
                stacklevel=3,
            )
            _warned_transpose = True
        return x.T
    if x.ndim == 2 and x.shape[1] != nvariables:
        raise ValueError(
            f"input has {x.shape[1]} features but the model was built with "
            f"nvariables={nvariables} (got shape {x.shape}; batch-first "
            f"(n, {nvariables}) expected)"
        )
    return x


class ICNFDist:
    """Unconditional flow distribution (reference ``ICNFDist``).

    Randomness contract (matches the reference, whose ICNFDist carries the
    model's hidden ``rng`` field): in ``Mode.TRAIN`` each ``logpdf`` call
    consumes a fresh Hutchinson probe, so two identical calls return slightly
    different stochastic estimates.  The probe key advances from ``key``
    (default ``PRNGKey(0)``) via counter splitting; pass ``key=`` per call to
    ``logpdf`` for reproducible estimates.  ``Mode.TEST`` (default) is exact
    and deterministic.
    """

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

    def logpdf(self, x: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        """Log-density.  ``key`` (optional) pins the train-mode probe for a
        reproducible stochastic estimate; without it the hidden key advances
        (see class docstring)."""
        if key is None:
            # every stochastic mode needs a probe key — TRAIN_NOREG included
            # (reference TrainMode{false} works through ICNFDist because the
            # rng rides in the model, dist_ext/core_icnf.jl:13-41)
            key = self._next_key() if self.mode.stochastic else None
        x = jnp.asarray(x, self.icnf.config.dtype)
        x = _shim_layout(x, self.icnf.config.nvariables)
        ys = self._ys_for(x.shape[0] if x.ndim > 1 else 1)
        logpx, _augs, _stats = inference(self.icnf, self.mode, x, self.params, key=key, ys=ys)
        return logpx

    def pdf(self, x: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        return jnp.exp(self.logpdf(x, key=key))

    def sample(self, key: jax.Array, n: int, trace_free: bool = False) -> jax.Array:
        """(n, nvariables) samples (reference ``_rand!`` = generate).

        ``trace_free=True``: integrate only the bare field when sampling —
        same distribution, per-step cost drops by the whole trace estimate
        (see :func:`continuousnormalizingflows_tpu.core.generate`)."""
        return generate(self.icnf, self.mode, self.params, key, n,
                        ys=self._ys_for(n), trace_free=trace_free)

    def sample_with_logpdf(self, key: jax.Array, n: int):
        """``(samples, logpdf)`` from ONE solve — the backward integration
        already carries the log-density accumulator (see
        :func:`continuousnormalizingflows_tpu.core.generate_with_logp`).
        With augmentation on, the density is over the augmented state (same
        caveat as ``logpdf`` on augmented models)."""
        from .core import generate_with_logp

        return generate_with_logp(self.icnf, self.mode, self.params, key, n,
                                  ys=self._ys_for(n))

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
