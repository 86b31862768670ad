"""Conditional neural field decoders (SIREN auto-decoders with FiLM latents).

TPU-native re-design of the reference NF zoo (reference
``ConditionalNeuralField/cnf/nf_networks.py``).  Models are pure functions
over explicit parameter pytrees:

* params are ``{"net1": [dense...], "net2": [dense...]}`` where each dense is
  ``{"kernel": (in, out), "bias": (out,)}`` — JAX convention; the torch port
  transposes the reference's ``(out, in)`` ``BatchLinear`` weights
  (``cnf/components.py:55-76`` applies ``x @ W^T``).
* the forward is ``x = sin(w0 * (net1[i](x) + net2[i](z)))`` per hidden layer
  with a linear head (``nf_networks.py:480-495``), FiLM-style additive latent
  modulation via bias-free ``net2``.
* SIREN init matches ``cnf/initialization.py:117-132``: hidden layers uniform
  ``±sqrt(6/fan_in)/w0``, first layers uniform ``±1/fan_in`` and biases
  following torch's ``nn.Linear`` default (``±1/sqrt(fan_in)``).

The flagship ``SIRENAutodecoder_film`` is what every CoNFiLD case uses; the
rest of the zoo is kept behind the same registry names.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_W0 = 30.0

Params = Any


# ---------------------------------------------------------------------------
# dense-layer init matching the reference's BatchLinear + SIREN schemes
# ---------------------------------------------------------------------------

def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_dense_siren(key, in_features: int, out_features: int, *,
                     w0: float = DEFAULT_W0, first_layer: bool = False,
                     use_bias: bool = True, dtype=jnp.float32) -> dict:
    """SIREN dense init (``initialization.py:117-132``): weights uniform
    ``±sqrt(6/in)/w0`` (hidden) or ``±1/in`` (first layer); bias follows the
    torch Linear default ``±1/sqrt(in)`` (bias is untouched by the reference's
    init fns, so it keeps the nn.Linear default)."""
    wkey, bkey = jax.random.split(key)
    if first_layer:
        bound = 1.0 / in_features
    else:
        bound = math.sqrt(6.0 / in_features) / w0
    layer = {"kernel": _uniform(wkey, (in_features, out_features), bound, dtype)}
    if use_bias:
        layer["bias"] = _uniform(bkey, (out_features,), 1.0 / math.sqrt(in_features), dtype)
    return layer


def dense_apply(layer: dict, x: jnp.ndarray) -> jnp.ndarray:
    out = x @ layer["kernel"]
    if "bias" in layer:
        out = out + layer["bias"]
    return out


# ---------------------------------------------------------------------------
# SIRENAutodecoder_film
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SirenFilmConfig:
    """Static architecture of a FiLM SIREN auto-decoder.

    ``num_hidden_layers`` counts the *middle* hidden-to-hidden layers like the
    reference ctor: net1 has ``num_hidden_layers + 2`` dense layers, net2 has
    ``num_hidden_layers + 1`` bias-free latent projections
    (``nf_networks.py:461-467``).
    """

    in_coord_features: int
    in_latent_features: int
    out_features: int
    num_hidden_layers: int
    hidden_features: int
    w0: float = DEFAULT_W0

    @property
    def n_modulated(self) -> int:
        return self.num_hidden_layers + 1


def init_siren_film(key, cfg: SirenFilmConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 2 * cfg.n_modulated + 1)
    net1 = []
    net2 = []
    for i in range(cfg.n_modulated):
        in_f = cfg.in_coord_features if i == 0 else cfg.hidden_features
        net1.append(init_dense_siren(
            keys[2 * i], in_f, cfg.hidden_features, w0=cfg.w0,
            first_layer=(i == 0), dtype=dtype))
        net2.append(init_dense_siren(
            keys[2 * i + 1], cfg.in_latent_features, cfg.hidden_features,
            w0=cfg.w0, first_layer=(i == 0), use_bias=False, dtype=dtype))
    net1.append(init_dense_siren(
        keys[-1], cfg.hidden_features, cfg.out_features, w0=cfg.w0, dtype=dtype))
    return {"net1": net1, "net2": net2}


def siren_film_apply(params: Params, coords: jnp.ndarray, latents: jnp.ndarray,
                     w0: float = DEFAULT_W0) -> jnp.ndarray:
    """Reference-semantics forward (``nf_networks.py:480-495``).

    ``coords``: ``(..., m, c)`` query points; ``latents``: broadcastable to
    ``(..., 1, l)`` (or ``(..., m, l)``).  Returns ``(..., m, out)``.
    Per hidden layer: ``x = sin(w0 * (net1[i](x) + net2[i](z)))``; linear head.
    """
    net1, net2 = params["net1"], params["net2"]
    x = coords
    for lin1, lin2 in zip(net1[:-1], net2):
        x = jnp.sin(w0 * (dense_apply(lin1, x) + dense_apply(lin2, latents)))
    return dense_apply(net1[-1], x)


def siren_film_extra_in_apply(params: Params, coords, latents,
                              w0: float = DEFAULT_W0) -> jnp.ndarray:
    """``SIRENAutodecoder_film_extra_in`` (``nf_networks.py:503-508``): coords
    is a pair ``(spatial_coords, extra_scalar)``; the scalar (broadcastable,
    e.g. per-sample ``(B, 1, 1)``) is prepended as a constant channel."""
    spatial, extra = coords
    extra_chan = jnp.ones_like(spatial[..., :1]) * extra
    spatial_b = jnp.broadcast_to(
        spatial, extra_chan.shape[:-1] + spatial.shape[-1:])
    return siren_film_apply(
        params, jnp.concatenate([extra_chan, spatial_b], axis=-1),
        latents, w0=w0)


# ---------------------------------------------------------------------------
# plain SIREN / MLP decoders (zoo parity)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SirenConfig:
    in_features: int
    out_features: int
    num_hidden_layers: int
    hidden_features: int
    w0: float = DEFAULT_W0


def init_siren(key, cfg: SirenConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    net = [init_dense_siren(keys[0], cfg.in_features, cfg.hidden_features,
                            w0=cfg.w0, first_layer=True, dtype=dtype)]
    for i in range(cfg.num_hidden_layers):
        net.append(init_dense_siren(keys[i + 1], cfg.hidden_features,
                                    cfg.hidden_features, w0=cfg.w0, dtype=dtype))
    net.append(init_dense_siren(keys[-1], cfg.hidden_features, cfg.out_features,
                                w0=cfg.w0, dtype=dtype))
    return {"net": net}


def siren_apply(params: Params, x: jnp.ndarray, w0: float = DEFAULT_W0) -> jnp.ndarray:
    net = params["net"]
    for lin in net[:-1]:
        x = jnp.sin(w0 * dense_apply(lin, x))
    return dense_apply(net[-1], x)


# ---------------------------------------------------------------------------
# Fourier feature mapping (reference cnf/components.py:269-342)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FeatureMappingConfig:
    in_features: int
    mode: str = "basic"          # basic | gaussian | positional
    map_size: int = 256          # gaussian feature count
    map_scale: float = 10.0      # gaussian B-matrix scale / positional scale
    num_freqs: int = 7           # positional frequencies

    @property
    def dim(self) -> int:
        if self.mode == "basic":
            return 2 * self.in_features
        if self.mode == "gaussian":
            return 2 * self.map_size
        if self.mode == "positional":
            return 2 * self.in_features * self.num_freqs
        raise ValueError(f"unknown premap mode {self.mode!r}")


def init_feature_mapping(key, cfg: FeatureMappingConfig) -> Params:
    if cfg.mode == "gaussian":
        b = jax.random.normal(key, (cfg.in_features, cfg.map_size)) * cfg.map_scale
        return {"B": b}
    return {}


def feature_mapping_apply(params: Params, cfg: FeatureMappingConfig, x):
    two_pi = 2.0 * jnp.pi
    if cfg.mode == "basic":
        return jnp.concatenate([jnp.sin(two_pi * x), jnp.cos(two_pi * x)], axis=-1)
    if cfg.mode == "gaussian":
        proj = two_pi * (x @ params["B"])
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
    if cfg.mode == "positional":
        freqs = (2.0 ** jnp.arange(cfg.num_freqs)) * jnp.pi * cfg.map_scale
        ang = x[..., None] * freqs            # (..., c, F)
        flat = ang.reshape(*x.shape[:-1], -1)
        return jnp.concatenate([jnp.sin(flat), jnp.cos(flat)], axis=-1)
    raise ValueError(f"unknown premap mode {cfg.mode!r}")


# ---------------------------------------------------------------------------
# Multiplicative filter networks (FourierNet / GaborNet,
# reference cnf/components.py:346-495)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MFNConfig:
    in_features: int
    out_features: int
    n_layers: int
    hidden_features: int
    input_scale: float = 256.0
    weight_scale: float = 1.0
    # gabor only:
    alpha: float = 6.0
    beta: float = 1.0
    filter_type: str = "fourier"   # fourier | gabor


def init_mfn(key, cfg: MFNConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 3 * (cfg.n_layers + 1) + 1)
    filters = []
    scale_per = cfg.input_scale / math.sqrt(cfg.n_layers + 1)
    for i in range(cfg.n_layers + 1):
        k_w, k_b, k_g = jax.random.split(keys[i], 3)
        filt = {
            "kernel": jax.random.normal(k_w, (cfg.in_features, cfg.hidden_features), dtype) * scale_per,
            "bias": jax.random.uniform(k_b, (cfg.hidden_features,), dtype,
                                       minval=-jnp.pi, maxval=jnp.pi),
        }
        if cfg.filter_type == "gabor":
            gamma = jax.random.gamma(k_g, cfg.alpha / (cfg.n_layers + 1),
                                     (cfg.hidden_features,)) / cfg.beta
            mu = jax.random.uniform(k_g, (cfg.in_features, cfg.hidden_features),
                                    dtype, minval=-1.0, maxval=1.0)
            filt["gamma"] = gamma.astype(dtype)
            filt["mu"] = mu
        filters.append(filt)

    linears = []
    bound = math.sqrt(cfg.weight_scale / cfg.hidden_features)
    for i in range(cfg.n_layers):
        k = keys[cfg.n_layers + 1 + i]
        linears.append({
            "kernel": _uniform(k, (cfg.hidden_features, cfg.hidden_features), bound, dtype),
            "bias": jnp.zeros((cfg.hidden_features,), dtype),
        })
    k_out = keys[-1]
    out = {
        "kernel": _uniform(k_out, (cfg.hidden_features, cfg.out_features),
                           math.sqrt(1.0 / cfg.hidden_features), dtype),
        "bias": jnp.zeros((cfg.out_features,), dtype),
    }
    return {"filters": filters, "linears": linears, "out": out}


def _mfn_filter_apply(filt: dict, cfg: MFNConfig, x):
    lin = x @ filt["kernel"] + filt["bias"]
    if cfg.filter_type == "fourier":
        return jnp.sin(lin)
    # gabor: gaussian envelope × sinusoid
    d2 = jnp.sum((x[..., None] - filt["mu"]) ** 2, axis=-2)
    return jnp.exp(-0.5 * filt["gamma"] * d2) * jnp.sin(lin)


def mfn_apply(params: Params, cfg: MFNConfig, x):
    z = _mfn_filter_apply(params["filters"][0], cfg, x)
    for filt, lin in zip(params["filters"][1:], params["linears"]):
        z = _mfn_filter_apply(filt, cfg, x) * (z @ lin["kernel"] + lin["bias"])
    return z @ params["out"]["kernel"] + params["out"]["bias"]


# ---------------------------------------------------------------------------
# Registry (reference registry names from nf_networks.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NFModel:
    """A neural-field model: config + init + apply(params, coords, latents)."""

    config: Any
    init: Callable[..., Params]
    apply: Callable[..., jnp.ndarray]

    def init_params(self, key, dtype=jnp.float32) -> Params:
        return self.init(key, self.config, dtype=dtype)

    def __call__(self, params, coords, latents):
        return self.apply(params, coords, latents)


def _make_film(name: str, apply_fn) -> Callable[..., NFModel]:
    def factory(in_coord_features: int, in_latent_features: int,
                out_features: int, num_hidden_layers: int,
                hidden_features: int, w0: float = DEFAULT_W0, **_ignored) -> NFModel:
        cfg = SirenFilmConfig(in_coord_features, in_latent_features,
                              out_features, num_hidden_layers,
                              hidden_features, w0)
        return NFModel(cfg, init_siren_film, partial(apply_fn, w0=w0))
    factory.__name__ = name
    return factory


NF_REGISTRY: dict[str, Callable[..., NFModel]] = {
    "SIRENAutodecoder_film": _make_film("SIRENAutodecoder_film", siren_film_apply),
    "SIRENAutodecoder_film_extra_in": _make_film(
        "SIRENAutodecoder_film_extra_in", siren_film_extra_in_apply),
}


def create_nf(name: str, **kwargs) -> NFModel:
    if name not in NF_REGISTRY:
        raise KeyError(f"unknown NF model {name!r}; known: {sorted(NF_REGISTRY)}")
    return NF_REGISTRY[name](**kwargs)


def siren_film_from_recipe(hp) -> NFModel:
    """Build the NF from a CNF recipe config (reference
    ``scripts/train.py:229-240``): coordinate dims + ``hidden_size`` latent
    width come from the top level, the rest from the ``NF:`` block."""
    nf_spec = hp.NF if isinstance(hp.NF, dict) else hp.NF.to_dict()
    kwargs = dict(nf_spec.get("kwargs", {}))
    if not kwargs:
        kwargs = {
            "out_features": nf_spec["out_features"],
            "num_hidden_layers": nf_spec["num_hidden_layers"],
            "hidden_features": nf_spec["hidden_features"],
        }
        # the reference's NF block carries the SIREN frequency as
        # ``omega_0`` (nf_networks.py:18,40-41); default 30 when absent
        for key in ("omega_0", "w0"):
            if key in nf_spec:
                kwargs["w0"] = float(nf_spec[key])
                break
    kwargs.setdefault("in_coord_features", hp.dims)
    kwargs.setdefault("in_latent_features", hp.hidden_size)
    return create_nf(nf_spec["name"], **kwargs)


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
