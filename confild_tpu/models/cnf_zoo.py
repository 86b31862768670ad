"""The full neural-field decoder zoo (reference
``ConditionalNeuralField/cnf/nf_networks.py`` — 11 architectures).

``SIRENAutodecoder_film`` (the one every CoNFiLD case uses) lives in
:mod:`confild_tpu.models.cnf`; this module adds the remaining variants behind
the same registry names:

* ``SIRENAutodecoder_film_single`` — plain SIREN, optional per-layer additive
  latents (``nf_networks.py:228-302``),
* ``SIREN_rez_Autodecoder_film`` — residual FiLM blocks with 0.5/0.5 skip
  (``:305-377``),
* ``SIRENAutodecoder_tw_film`` — FiLM SIREN with a trainable ``w0``
  (``:379-438``, ``Sine_tw`` at ``components.py:27-33``),
* ``FNAutodecoder_film`` / ``GNAutodecoder_film`` — multiplicative filter
  (Fourier / Gabor) FiLM decoders (``:511-645``),
* ``SIRENAutodecoder_fp`` — hypernetwork emits the full SIREN weight vector
  per latent (``:647-765``),
* ``SIRENAutodecoder_mdf_film`` — FiLM + per-latent full-projection weight
  modulation (``:767-845``),
* ``SIRENAutoencoder_film`` / ``SIRENAutoencoder_fp`` — encoder (hyper-MLP
  over priors) variants returning (out, latents[, params]) (``:12-226``),
* ``*_extra_in`` wrappers that prepend a scalar channel to coords.

All are pure init/apply pairs over explicit param pytrees, registered into
:data:`confild_tpu.models.cnf.NF_REGISTRY`.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from confild_tpu.models.cnf import (DEFAULT_W0, NF_REGISTRY, NFModel,
                                    dense_apply, init_dense_siren)

Params = Any


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _extra_in(coords):
    spatial, extra = coords
    return jnp.concatenate(
        [jnp.ones_like(spatial[..., :1]) * extra, spatial], axis=-1)


# ---------------------------------------------------------------------------
# SIRENAutodecoder_film_single
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SirenSingleConfig:
    in_coord_features: int
    out_features: int
    num_hidden_layers: int
    hidden_features: int
    w0: float = DEFAULT_W0


def init_siren_single(key, cfg: SirenSingleConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    net1 = [init_dense_siren(keys[0], cfg.in_coord_features,
                             cfg.hidden_features, w0=cfg.w0, first_layer=True,
                             dtype=dtype)]
    for i in range(cfg.num_hidden_layers):
        net1.append(init_dense_siren(keys[i + 1], cfg.hidden_features,
                                     cfg.hidden_features, w0=cfg.w0,
                                     dtype=dtype))
    net1.append(init_dense_siren(keys[-1], cfg.hidden_features,
                                 cfg.out_features, w0=cfg.w0, dtype=dtype))
    return {"net1": net1}


def siren_single_apply(params, coords, all_latents=None, w0=DEFAULT_W0):
    net1 = params["net1"]
    x = coords
    for i, lin in enumerate(net1[:-1]):
        x = dense_apply(lin, x)
        if all_latents is not None:
            x = x + all_latents[i]
        x = jnp.sin(w0 * x)
    return dense_apply(net1[-1], x)


# ---------------------------------------------------------------------------
# SIREN_rez_Autodecoder_film
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SirenRezConfig:
    in_coord_features: int
    in_latent_features: int
    out_features: int
    num_hidden_blocks: int
    hidden_features: int
    num_hidden_layers_rez: int = 2
    w0: float = DEFAULT_W0


def init_siren_rez(key, cfg: SirenRezConfig, dtype=jnp.float32) -> Params:
    n_mod = cfg.num_hidden_blocks * cfg.num_hidden_layers_rez + 1
    keys = jax.random.split(key, 2 * n_mod + 1)
    net1, net2 = [], []
    for i in range(n_mod):
        in_f = cfg.in_coord_features if i == 0 else cfg.hidden_features
        net1.append(init_dense_siren(keys[2 * i], in_f, cfg.hidden_features,
                                     w0=cfg.w0, first_layer=(i == 0),
                                     dtype=dtype))
        net2.append(init_dense_siren(keys[2 * i + 1], cfg.in_latent_features,
                                     cfg.hidden_features, w0=cfg.w0,
                                     first_layer=(i == 0), use_bias=False,
                                     dtype=dtype))
    net1.append(init_dense_siren(keys[-1], cfg.hidden_features,
                                 cfg.out_features, w0=cfg.w0, dtype=dtype))
    return {"net1": net1, "net2": net2}


def siren_rez_apply(params, coords, latents, *, num_hidden_blocks: int,
                    num_hidden_layers_rez: int, w0=DEFAULT_W0):
    net1, net2 = params["net1"], params["net2"]
    x = jnp.sin(w0 * (dense_apply(net1[0], coords)
                      + dense_apply(net2[0], latents)))
    for i in range(num_hidden_blocks):
        x0 = x
        for j in range(num_hidden_layers_rez):
            ij = 1 + i * num_hidden_layers_rez + j
            x = jnp.sin(w0 * (dense_apply(net1[ij], x)
                              + dense_apply(net2[ij], latents)))
        x = 0.5 * x0 + 0.5 * x
    return dense_apply(net1[-1], x)


# ---------------------------------------------------------------------------
# SIRENAutodecoder_tw_film (trainable w0)
# ---------------------------------------------------------------------------

def init_siren_tw_film(key, cfg, dtype=jnp.float32) -> Params:
    from confild_tpu.models.cnf import SirenFilmConfig, init_siren_film
    params = init_siren_film(key, SirenFilmConfig(
        cfg.in_coord_features, cfg.in_latent_features, cfg.out_features,
        cfg.num_hidden_layers, cfg.hidden_features, cfg.w0), dtype)
    params["w0"] = jnp.asarray([cfg.w0], dtype)
    return params


def siren_tw_film_apply(params, coords, latents, **_):
    net1, net2 = params["net1"], params["net2"]
    w0 = params["w0"]
    x = coords
    for lin1, lin2 in zip(net1[:-1], net2):
        x = jnp.sin(w0 * (dense_apply(lin1, x) + dense_apply(lin2, latents)))
    return dense_apply(net1[-1], x)


# ---------------------------------------------------------------------------
# MFN FiLM decoders (FNAutodecoder_film / GNAutodecoder_film)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MFNFilmConfig:
    in_coord_features: int
    in_latent_features: int
    out_features: int
    num_hidden_layers: int
    hidden_features: int
    input_scale: float = 256.0
    weight_scale: float = 1.0
    alpha: float = 6.0
    beta: float = 1.0
    filter_type: str = "fourier"


def _init_filter(key, cfg: MFNFilmConfig, dtype):
    """Fourier/Gabor filter layer (reference ``components.py:389-456``)."""
    k_w, k_b, k_mu, k_g = jax.random.split(key, 4)
    scale_per = cfg.input_scale / math.sqrt(cfg.num_hidden_layers + 1)
    bound = 1.0 / math.sqrt(cfg.in_coord_features)
    # torch Linear default then scaled by weight_scale (FourierLayer) or by
    # weight_scale*sqrt(gamma) (GaborLayer)
    w = _uniform(k_w, (cfg.in_coord_features, cfg.hidden_features), bound, dtype)
    b = jax.random.uniform(k_b, (cfg.hidden_features,), dtype,
                           minval=-np.pi, maxval=np.pi)
    filt = {"bias": b}
    if cfg.filter_type == "gabor":
        gamma = jax.random.gamma(
            k_g, cfg.alpha / (cfg.num_hidden_layers + 1),
            (cfg.hidden_features,)).astype(dtype) / cfg.beta
        filt["gamma"] = gamma
        filt["mu"] = _uniform(k_mu, (cfg.in_coord_features,
                                     cfg.hidden_features), 1.0, dtype)
        filt["kernel"] = w * scale_per * jnp.sqrt(gamma)[None, :]
    else:
        filt["kernel"] = w * scale_per
    return filt


def _apply_filter(filt, cfg: MFNFilmConfig, x):
    lin = x @ filt["kernel"] + filt["bias"]
    if cfg.filter_type == "gabor":
        d = (jnp.sum(x ** 2, -1)[..., None]
             + jnp.sum(filt["mu"] ** 2, 0)[None, :]
             - 2 * (x @ filt["mu"]))
        return jnp.sin(lin) * jnp.exp(-0.5 * d * filt["gamma"][None, :])
    return jnp.sin(lin)


def init_mfn_film(key, cfg: MFNFilmConfig, dtype=jnp.float32) -> Params:
    n = cfg.num_hidden_layers
    keys = jax.random.split(key, 3 * (n + 1) + 2)
    bound1 = math.sqrt(cfg.weight_scale / cfg.hidden_features)
    bound2 = math.sqrt(cfg.weight_scale / cfg.in_latent_features)
    bound_b = 1.0 / math.sqrt(cfg.hidden_features)
    net1 = [{
        "kernel": _uniform(keys[i], (cfg.hidden_features, cfg.hidden_features),
                           bound1, dtype),
        "bias": _uniform(jax.random.fold_in(keys[i], 1),
                         (cfg.hidden_features,), bound_b, dtype),
    } for i in range(n)]
    net1.append({
        "kernel": _uniform(keys[n], (cfg.hidden_features, cfg.out_features),
                           bound1, dtype),
        "bias": _uniform(jax.random.fold_in(keys[n], 1),
                         (cfg.out_features,), bound_b, dtype),
    })
    net2 = [{"kernel": _uniform(keys[n + 1 + i],
                                (cfg.in_latent_features, cfg.hidden_features),
                                bound2, dtype)} for i in range(n + 1)]
    filters = [_init_filter(keys[2 * n + 2 + i], cfg, dtype)
               for i in range(n + 1)]
    return {"net1": net1, "net2": net2, "filters": filters}


def mfn_film_apply(params, coords, latents, *, cfg: MFNFilmConfig):
    """x = filter_0(c) * net2_0(z); x = filter_i(c) * (net1_{i-1}(x) +
    net2_i(z)); head (reference ``nf_networks.py:557-573``)."""
    net1, net2, filters = params["net1"], params["net2"], params["filters"]
    x0 = coords
    x = _apply_filter(filters[0], cfg, x0) * dense_apply(net2[0], latents)
    for i in range(1, len(filters)):
        x = _apply_filter(filters[i], cfg, x0) * (
            dense_apply(net1[i - 1], x) + dense_apply(net2[i], latents))
    return dense_apply(net1[-1], x)


# ---------------------------------------------------------------------------
# SIRENAutodecoder_fp (hypernetwork full projection)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SirenFPConfig:
    hyper_latent_features: int
    nf_in_features: int
    out_features: int
    nf_num_hidden_layers: int
    nf_hidden_features: int
    omega_0_e: float = DEFAULT_W0
    omega_0: float = DEFAULT_W0

    @property
    def num_nf_params(self) -> int:
        c, h, o, n = (self.nf_in_features, self.nf_hidden_features,
                      self.out_features, self.nf_num_hidden_layers)
        return (c + 1) * h + n * (h + 1) * h + (h + 1) * o


def init_siren_fp(key, cfg: SirenFPConfig, dtype=jnp.float32) -> Params:
    """Hypernet head init (reference ``nf_networks.py:712-733``): weights
    uniform ±sqrt(6/latent)*1e-2; per-slot bias bounds emulate SIREN init of
    the generated parameters."""
    k_w, k_b = jax.random.split(key)
    c, h, o, n = (cfg.nf_in_features, cfg.nf_hidden_features,
                  cfg.out_features, cfg.nf_num_hidden_layers)
    n_out = cfg.num_nf_params
    bound_w = math.sqrt(6.0 / cfg.hyper_latent_features) * 1e-2
    kernel = _uniform(k_w, (cfg.hyper_latent_features, n_out), bound_w, dtype)

    bounds = np.ones(n_out, np.float32)
    n_first = c * h
    n_w = n_first + n * h * h + h * o
    bounds[:n_first] = 1.0 / c
    bounds[n_first:n_w] = math.sqrt(6.0 / h) / cfg.omega_0_e
    bounds[n_w:] = 1.0 / h
    bias = jax.random.uniform(k_b, (n_out,), dtype) * 2 * bounds - bounds
    return {"hyper_last": {"kernel": kernel, "bias": bias}}


def siren_fp_apply(params, coords, latents, *, cfg: SirenFPConfig):
    """Decode: latents -> full SIREN parameter vector -> evaluate
    (reference ``nf_networks.py:688-765``).  latents: (..., 1, L) broadcast
    rows; coords: (..., m, c)."""
    p = dense_apply(params["hyper_last"], latents)  # (..., 1, n_params)
    c, h, o, n = (cfg.nf_in_features, cfg.nf_hidden_features,
                  cfg.out_features, cfg.nf_num_hidden_layers)

    cur = 0

    def take(size, shape):
        nonlocal cur
        out = p[..., cur:cur + size].reshape(p.shape[:-2] + shape)
        cur += size
        return out

    w1 = take(c * h, (c, h))
    hidden_ws = [take(h * h, (h, h)) for _ in range(n)]
    w2 = take(h * o, (h, o))
    b1 = p[..., cur:cur + h]
    cur += h
    hidden_bs = []
    for _ in range(n):
        hidden_bs.append(p[..., cur:cur + h])
        cur += h
    b2 = p[..., cur:]

    w0 = cfg.omega_0
    x = jnp.sin(w0 * (jnp.einsum("...mi,...ij->...mj", coords, w1) + b1))
    for wi, bi in zip(hidden_ws, hidden_bs):
        x = jnp.sin(w0 * (jnp.einsum("...mi,...ij->...mj", x, wi) + bi))
    return jnp.einsum("...mi,...ij->...mj", x, w2) + b2


# ---------------------------------------------------------------------------
# SIRENAutodecoder_mdf_film
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SirenMDFConfig:
    in_coord_features: int
    in_latent_features: int
    out_features: int
    num_hidden_layers: int
    hidden_features: int
    w0: float = DEFAULT_W0


def init_siren_mdf_film(key, cfg: SirenMDFConfig, dtype=jnp.float32) -> Params:
    n_mod = cfg.num_hidden_layers + 1
    keys = jax.random.split(key, 3 * n_mod + 1)
    nf_net = []
    for i in range(n_mod):
        in_f = cfg.in_coord_features if i == 0 else cfg.hidden_features
        nf_net.append(init_dense_siren(keys[i], in_f, cfg.hidden_features,
                                       w0=cfg.w0, first_layer=(i == 0),
                                       dtype=dtype))
    nf_net.append(init_dense_siren(keys[n_mod], cfg.hidden_features,
                                   cfg.out_features, w0=cfg.w0, dtype=dtype))
    # hyper weight/bias nets: uniform ±sqrt(6/in)*1e-2
    # (init_weights_uniform_siren_scale, initialization.py:77-84)
    bound = math.sqrt(6.0 / cfg.in_latent_features) * 1e-2
    hw_net, hb_net = [], []
    for i in range(n_mod):
        in_f = cfg.in_coord_features if i == 0 else cfg.hidden_features
        hw_net.append({"kernel": _uniform(
            keys[n_mod + 1 + i],
            (cfg.in_latent_features, in_f * cfg.hidden_features),
            bound, dtype)})
        hb_net.append({"kernel": _uniform(
            keys[2 * n_mod + 1 + i],
            (cfg.in_latent_features, cfg.hidden_features), bound, dtype)})
    return {"nf_net": nf_net, "hw_net": hw_net, "hb_net": hb_net}


def siren_mdf_film_apply(params, coords, latents, *, cfg: SirenMDFConfig):
    """x = nl(nf_i(x) + einsum(x, Wmod_i(z)) + bmod_i(z))
    (reference ``nf_networks.py:816-841``; the einsum uses the TRANSPOSED
    generated weight, 'thwji' — reproduced)."""
    nf_net, hw_net, hb_net = params["nf_net"], params["hw_net"], params["hb_net"]
    w0 = cfg.w0
    x = coords
    for i in range(len(nf_net) - 1):
        in_f = cfg.in_coord_features if i == 0 else cfg.hidden_features
        wmod = dense_apply(hw_net[i], latents)
        wmod = wmod.reshape(wmod.shape[:-1] + (cfg.hidden_features, in_f))
        bmod = dense_apply(hb_net[i], latents)
        x = (dense_apply(nf_net[i], x)
             + jnp.einsum("...mi,...ji->...mj", x, wmod[..., 0, :, :])
             + bmod)
        x = jnp.sin(w0 * x)
    return dense_apply(nf_net[-1], x)


# ---------------------------------------------------------------------------
# Autoencoder variants (hyper-MLP encoder over priors)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SirenAEFilmConfig:
    hyper_in_features: int
    hyper_latent_features: int
    hyper_num_hidden_layers: int
    hyper_hidden_features: int
    nf_in_features: int
    out_features: int
    nf_num_hidden_layers: int
    nf_hidden_features: int
    omega_0_e: float = DEFAULT_W0
    omega_0: float = DEFAULT_W0


def _init_hyper_mlp(key, in_f, hidden, n_layers, out_f, w0, dtype):
    keys = jax.random.split(key, n_layers + 2)
    net = [init_dense_siren(keys[0], in_f, hidden, w0=w0, first_layer=True,
                            dtype=dtype)]
    for i in range(n_layers):
        net.append(init_dense_siren(keys[i + 1], hidden, hidden, w0=w0,
                                    dtype=dtype))
    net.append(init_dense_siren(keys[-1], hidden, out_f, w0=w0, dtype=dtype))
    return net


def init_siren_ae_film(key, cfg: SirenAEFilmConfig, dtype=jnp.float32) -> Params:
    from confild_tpu.models.cnf import SirenFilmConfig, init_siren_film
    k1, k2 = jax.random.split(key)
    hyper_net = _init_hyper_mlp(k1, cfg.hyper_in_features,
                                cfg.hyper_hidden_features,
                                cfg.hyper_num_hidden_layers,
                                cfg.hyper_latent_features, cfg.omega_0_e, dtype)
    film = init_siren_film(k2, SirenFilmConfig(
        cfg.nf_in_features, cfg.hyper_latent_features, cfg.out_features,
        cfg.nf_num_hidden_layers, cfg.nf_hidden_features, cfg.omega_0), dtype)
    return {"hyper_net": hyper_net, "nf_net": film["net1"],
            "proj_net": film["net2"]}


def siren_ae_film_apply(params, coords, priors, *, cfg: SirenAEFilmConfig):
    """Encoder MLP (sine activations) -> latents -> FiLM decode; returns
    (out, latents) (reference ``nf_networks.py:193-215``)."""
    hyper = params["hyper_net"]
    p = priors
    for lin in hyper[:-1]:
        p = jnp.sin(cfg.omega_0_e * dense_apply(lin, p))
    latents = dense_apply(hyper[-1], p)

    x = coords
    for lin1, lin2 in zip(params["nf_net"][:-1], params["proj_net"]):
        x = jnp.sin(cfg.omega_0 * (dense_apply(lin1, x)
                                   + dense_apply(lin2, latents)))
    return dense_apply(params["nf_net"][-1], x), latents


def init_siren_ae_fp(key, cfg: SirenAEFilmConfig, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    hyper_net = _init_hyper_mlp(k1, cfg.hyper_in_features,
                                cfg.hyper_hidden_features,
                                cfg.hyper_num_hidden_layers,
                                cfg.hyper_latent_features, cfg.omega_0_e, dtype)
    fp = init_siren_fp(k2, SirenFPConfig(
        cfg.hyper_latent_features, cfg.nf_in_features, cfg.out_features,
        cfg.nf_num_hidden_layers, cfg.nf_hidden_features,
        cfg.omega_0_e, cfg.omega_0), dtype)
    return {"hyper_net": hyper_net, "hyper_last": fp["hyper_last"]}


def siren_ae_fp_apply(params, coords, priors, *, cfg: SirenAEFilmConfig):
    """Encoder -> latent -> full parameter projection -> SIREN evaluate;
    returns (out, latent, params_vec) (reference ``nf_networks.py:57-110``)."""
    hyper = params["hyper_net"]
    p = priors
    for lin in hyper[:-1]:
        p = jnp.sin(cfg.omega_0_e * dense_apply(lin, p))
    latent = dense_apply(hyper[-1], p)
    fp_cfg = SirenFPConfig(cfg.hyper_latent_features, cfg.nf_in_features,
                           cfg.out_features, cfg.nf_num_hidden_layers,
                           cfg.nf_hidden_features, cfg.omega_0_e, cfg.omega_0)
    out = siren_fp_apply({"hyper_last": params["hyper_last"]}, coords, latent,
                         cfg=fp_cfg)
    params_vec = dense_apply(params["hyper_last"], latent)
    return out, latent, params_vec


# ---------------------------------------------------------------------------
# registry wiring
# ---------------------------------------------------------------------------

def _reg(name):
    def deco(factory):
        factory.__name__ = name
        NF_REGISTRY[name] = factory
        return factory
    return deco


@_reg("SIRENAutodecoder_film_single")
def _film_single(in_coord_features, out_features, num_hidden_layers,
                 hidden_features, w0: float = DEFAULT_W0, **_):
    cfg = SirenSingleConfig(in_coord_features, out_features,
                            num_hidden_layers, hidden_features, w0)
    return NFModel(cfg, init_siren_single, partial(siren_single_apply, w0=w0))


@_reg("SIREN_rez_Autodecoder_film")
def _rez_film(in_coord_features, in_latent_features, out_features,
              num_hidden_blocks=None, hidden_features=None,
              num_hidden_layers_rez: int = 2, num_hidden_layers=None,
              w0: float = DEFAULT_W0, **_):
    blocks = num_hidden_blocks if num_hidden_blocks is not None else num_hidden_layers
    cfg = SirenRezConfig(in_coord_features, in_latent_features, out_features,
                         blocks, hidden_features, num_hidden_layers_rez, w0)
    return NFModel(cfg, init_siren_rez,
                   partial(siren_rez_apply, num_hidden_blocks=blocks,
                           num_hidden_layers_rez=num_hidden_layers_rez, w0=w0))


@_reg("SIRENAutodecoder_tw_film")
def _tw_film(in_coord_features, in_latent_features, out_features,
             num_hidden_layers, hidden_features, w0_init: float = DEFAULT_W0,
             **_):
    from confild_tpu.models.cnf import SirenFilmConfig
    cfg = SirenFilmConfig(in_coord_features, in_latent_features, out_features,
                          num_hidden_layers, hidden_features, w0_init)
    return NFModel(cfg, init_siren_tw_film, siren_tw_film_apply)


@_reg("FNAutodecoder_film")
def _fn_film(in_coord_features, in_latent_features, out_features,
             num_hidden_layers, hidden_features, input_scale: float = 256.0,
             weight_scale: float = 1.0, **_):
    cfg = MFNFilmConfig(in_coord_features, in_latent_features, out_features,
                        num_hidden_layers, hidden_features, input_scale,
                        weight_scale, filter_type="fourier")
    return NFModel(cfg, init_mfn_film, partial(mfn_film_apply, cfg=cfg))


@_reg("GNAutodecoder_film")
def _gn_film(in_coord_features, in_latent_features, out_features,
             num_hidden_layers, hidden_features, input_scale: float = 256.0,
             weight_scale: float = 1.0, alpha: float = 6.0, beta: float = 1.0,
             **_):
    cfg = MFNFilmConfig(in_coord_features, in_latent_features, out_features,
                        num_hidden_layers, hidden_features, input_scale,
                        weight_scale, alpha, beta, filter_type="gabor")
    return NFModel(cfg, init_mfn_film, partial(mfn_film_apply, cfg=cfg))


@_reg("SIRENAutodecoder_fp")
def _fp(hyper_latent_features=None, nf_in_features=None, out_features=None,
        nf_num_hidden_layers=None, nf_hidden_features=None,
        in_coord_features=None, in_latent_features=None,
        num_hidden_layers=None, hidden_features=None,
        omega_0_e: float = DEFAULT_W0, omega_0: float = DEFAULT_W0, **_):
    cfg = SirenFPConfig(
        hyper_latent_features or in_latent_features,
        nf_in_features or in_coord_features,
        out_features,
        nf_num_hidden_layers if nf_num_hidden_layers is not None
        else num_hidden_layers,
        nf_hidden_features or hidden_features,
        omega_0_e, omega_0)
    return NFModel(cfg, init_siren_fp, partial(siren_fp_apply, cfg=cfg))


@_reg("SIRENAutodecoder_mdf_film")
def _mdf_film(in_coord_features, in_latent_features, out_features,
              num_hidden_layers, hidden_features, w0: float = DEFAULT_W0, **_):
    cfg = SirenMDFConfig(in_coord_features, in_latent_features, out_features,
                         num_hidden_layers, hidden_features, w0)
    return NFModel(cfg, init_siren_mdf_film,
                   partial(siren_mdf_film_apply, cfg=cfg))


@_reg("SIRENAutodecoder_mdf_film_extra_in")
def _mdf_film_extra(in_coord_features, **kw):
    base = _mdf_film(in_coord_features=in_coord_features, **kw)
    return NFModel(base.config, base.init,
                   lambda p, c, z: base.apply(p, _extra_in(c), z))


@_reg("SIRENAutoencoder_film")
def _ae_film(hyper_in_features, hyper_latent_features, hyper_num_hidden_layers,
             hyper_hidden_features, nf_in_features, out_features,
             nf_num_hidden_layers, nf_hidden_features,
             omega_0_e: float = DEFAULT_W0, omega_0: float = DEFAULT_W0, **_):
    cfg = SirenAEFilmConfig(hyper_in_features, hyper_latent_features,
                            hyper_num_hidden_layers, hyper_hidden_features,
                            nf_in_features, out_features,
                            nf_num_hidden_layers, nf_hidden_features,
                            omega_0_e, omega_0)
    return NFModel(cfg, init_siren_ae_film,
                   partial(siren_ae_film_apply, cfg=cfg))


@_reg("SIRENAutoencoder_film_extra_in")
def _ae_film_extra(**kw):
    base = _ae_film(**kw)
    return NFModel(base.config, base.init,
                   lambda p, c, z: base.apply(p, _extra_in(c), z))


@_reg("SIRENAutoencoder_fp")
def _ae_fp(hyper_in_features, hyper_latent_features, hyper_num_hidden_layers,
           hyper_hidden_features, nf_in_features, out_features,
           nf_num_hidden_layers, nf_hidden_features,
           omega_0_e: float = DEFAULT_W0, omega_0: float = DEFAULT_W0, **_):
    cfg = SirenAEFilmConfig(hyper_in_features, hyper_latent_features,
                            hyper_num_hidden_layers, hyper_hidden_features,
                            nf_in_features, out_features,
                            nf_num_hidden_layers, nf_hidden_features,
                            omega_0_e, omega_0)
    return NFModel(cfg, init_siren_ae_fp, partial(siren_ae_fp_apply, cfg=cfg))
