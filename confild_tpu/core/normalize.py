"""Field/coordinate normalizers as pure functions over a param pytree.

Reproduces the reference normalizer semantics exactly (reference
``ConditionalNeuralField/cnf/utils/normalize.py:99-120``):

* ``'-11'``  : ``(x - min) / (max - min) * 2 - 1``      params = (max, min)
* ``'01'``   : ``(x - min) / (max - min)``              params = (max, min)
* ``'ms'``   : ``(x - mean) / std``                     params = (mean, std)
* ``'none'`` : identity                                 params = None

Fitting matches the torch behavior: reduction over ``dim`` with
``keepdims=True`` (global scalar when ``dim is None``) and *Bessel-corrected*
std (torch default ``unbiased=True``).  These constants gate checkpoint parity
so they must match bit-for-bit.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np

METHODS = ("-11", "01", "ms", "none")


def fit(data, method: str = "-11", dim: int | None = None):
    """Compute normalizer params from data. Returns a (a, b) tuple or None."""
    if method == "none":
        return None
    xp = np if isinstance(data, np.ndarray) else jnp
    if method in ("-11", "01"):
        if dim is None:
            return (xp.max(data), xp.min(data))
        return (
            xp.max(data, axis=dim, keepdims=True),
            xp.min(data, axis=dim, keepdims=True),
        )
    if method == "ms":
        if dim is None:
            # torch.mean(data, None)/torch.std(data, dim=None): global, ddof=1
            return (xp.mean(data), xp.std(data, ddof=1))
        return (
            xp.mean(data, axis=dim, keepdims=True),
            xp.std(data, axis=dim, keepdims=True, ddof=1),
        )
    raise ValueError(f"unknown normalizer method {method!r}")


def normalize(data, params, method: str = "-11"):
    if method == "-11":
        return (data - params[1]) / (params[0] - params[1]) * 2 - 1
    if method == "01":
        return (data - params[1]) / (params[0] - params[1])
    if method == "ms":
        return (data - params[0]) / params[1]
    if method == "none":
        return data
    raise ValueError(f"unknown normalizer method {method!r}")


def denormalize(data_norm, params, method: str = "-11"):
    if method == "-11":
        return (data_norm + 1) / 2 * (params[0] - params[1]) + params[1]
    if method == "01":
        return data_norm * (params[0] - params[1]) + params[1]
    if method == "ms":
        return data_norm * params[1] + params[0]
    if method == "none":
        return data_norm
    raise ValueError(f"unknown normalizer method {method!r}")


class Normalizer:
    """Stateful convenience wrapper mirroring the reference ``Normalizer_ts``
    API (``fit_normalize`` / ``normalize`` / ``denormalize`` / ``get_params``).

    ``params`` is an optional (a, b) pair; pass an empty sequence (the
    reference default) to fit from data.
    """

    def __init__(self, params: Sequence[Any] = (), method: str = "-11",
                 dim: int | None = None):
        self.params = tuple(params) if params is not None and len(params) else None
        self.method = method
        self.dim = dim

    def fit_normalize(self, data):
        if self.params is None and self.method != "none":
            self.params = fit(data, self.method, self.dim)
        return normalize(data, self.params, self.method)

    def normalize(self, data):
        return normalize(data, self.params, self.method)

    def denormalize(self, data_norm):
        return denormalize(data_norm, self.params, self.method)

    def get_params(self):
        return self.params

    def as_jax(self) -> "Normalizer":
        """Return a copy with params promoted to jnp arrays (device-ready)."""
        if self.params is None:
            return Normalizer((), self.method, self.dim)
        params = tuple(jnp.asarray(p) for p in self.params)
        return Normalizer(params, self.method, self.dim)


def get_data_range(stacked_fields):
    """Global (max, min) over a stack of per-snapshot fields — the reference's
    ``get_data_range`` (``normalize.py:124-132``) reduced to the functional
    form used by the diffusion stage's latent scaling."""
    xp = np if isinstance(stacked_fields, np.ndarray) else jnp
    return xp.max(stacked_fields), xp.min(stacked_fields)
