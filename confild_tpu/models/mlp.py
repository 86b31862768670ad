"""Plain MLP primitives (reference ``cnf/components.py:141-266``:
``MLP``, ``MLP_rezblk``, ``MLP_reznet``) with the reference's activation
registry names (``NLS_AND_INITS``, ``components.py:39-49``)."""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp

from confild_tpu.models.cnf import DEFAULT_W0, dense_apply, init_dense_siren


ACTIVATIONS: dict[str, Callable] = {
    "sine": lambda x: jnp.sin(DEFAULT_W0 * x),
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "selu": jax.nn.selu,
    "softplus": jax.nn.softplus,
    "elu": jax.nn.elu,
    "swish": jax.nn.silu,
}


def _init_layer(key, in_f, out_f, nonlinearity, first, dtype):
    if nonlinearity == "sine":
        return init_dense_siren(key, in_f, out_f, first_layer=first,
                                dtype=dtype)
    wkey, bkey = jax.random.split(key)
    if nonlinearity in ("relu", "softplus"):        # kaiming-normal fan-in
        std = math.sqrt(2.0 / in_f)
        kernel = std * jax.random.normal(wkey, (in_f, out_f), dtype)
    elif nonlinearity == "selu":
        kernel = jax.random.normal(wkey, (in_f, out_f), dtype) / math.sqrt(in_f)
    elif nonlinearity == "elu":
        std = math.sqrt(1.5505188080679277) / math.sqrt(in_f)
        kernel = std * jax.random.normal(wkey, (in_f, out_f), dtype)
    else:                                            # xavier-normal
        std = math.sqrt(2.0 / (in_f + out_f))
        kernel = std * jax.random.normal(wkey, (in_f, out_f), dtype)
    bound = 1.0 / math.sqrt(in_f)
    bias = jax.random.uniform(bkey, (out_f,), dtype, -bound, bound)
    return {"kernel": kernel, "bias": bias}


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    in_features: int
    out_features: int
    num_hidden_layers: int
    hidden_features: int
    nonlinearity: str = "relu"
    outermost_linear: bool = True


def init_mlp(key, cfg: MLPConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    net = [_init_layer(keys[0], cfg.in_features, cfg.hidden_features,
                       cfg.nonlinearity, True, dtype)]
    for i in range(cfg.num_hidden_layers):
        net.append(_init_layer(keys[i + 1], cfg.hidden_features,
                               cfg.hidden_features, cfg.nonlinearity, False,
                               dtype))
    net.append(_init_layer(keys[-1], cfg.hidden_features, cfg.out_features,
                           cfg.nonlinearity, False, dtype))
    return {"net": net}


def mlp_apply(params, cfg: MLPConfig, x):
    nl = ACTIVATIONS[cfg.nonlinearity]
    net = params["net"]
    for lin in net[:-1]:
        x = nl(dense_apply(lin, x))
    x = dense_apply(net[-1], x)
    return x if cfg.outermost_linear else nl(x)


@dataclasses.dataclass(frozen=True)
class MLPRezConfig(MLPConfig):
    num_layers_per_block: int = 2


def init_mlp_reznet(key, cfg: MLPRezConfig, dtype=jnp.float32):
    """Residual MLP: first layer + num_hidden_layers blocks of
    num_layers_per_block layers with 0.5/0.5 skips + head
    (reference ``MLP_reznet``, ``components.py:214-266``)."""
    n_mid = cfg.num_hidden_layers * cfg.num_layers_per_block
    keys = jax.random.split(key, n_mid + 2)
    net = [_init_layer(keys[0], cfg.in_features, cfg.hidden_features,
                       cfg.nonlinearity, True, dtype)]
    for i in range(n_mid):
        net.append(_init_layer(keys[i + 1], cfg.hidden_features,
                               cfg.hidden_features, cfg.nonlinearity, False,
                               dtype))
    net.append(_init_layer(keys[-1], cfg.hidden_features, cfg.out_features,
                           cfg.nonlinearity, False, dtype))
    return {"net": net}


def mlp_reznet_apply(params, cfg: MLPRezConfig, x):
    nl = ACTIVATIONS[cfg.nonlinearity]
    net = params["net"]
    x = nl(dense_apply(net[0], x))
    idx = 1
    for _ in range(cfg.num_hidden_layers):
        x0 = x
        for _ in range(cfg.num_layers_per_block):
            x = nl(dense_apply(net[idx], x))
            idx += 1
        x = 0.5 * x0 + 0.5 * x
    return dense_apply(net[-1], x)
