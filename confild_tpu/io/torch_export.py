"""Export framework checkpoints to reference-compatible ``.pt`` files so
models trained here load in the PyTorch reference unmodified (the inverse of
:mod:`confild_tpu.io.torch_port`).

Uses torch (CPU) for serialization — export is an offline interop path, not
part of the TPU compute flow.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _torch():
    import torch
    return torch


def cnf_state_dict(params: Any) -> dict:
    """Our param pytree -> reference ``SIRENAutodecoder_film`` state dict
    (``net1.i.weight`` ``(out, in)``, bias-free ``net2``)."""
    torch = _torch()
    sd = {}
    for i, layer in enumerate(params["net1"]):
        sd[f"net1.{i}.weight"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(layer["kernel"]).T))
        if "bias" in layer:
            sd[f"net1.{i}.bias"] = torch.from_numpy(np.asarray(layer["bias"]))
    for i, layer in enumerate(params["net2"]):
        sd[f"net2.{i}.weight"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(layer["kernel"]).T))
    return sd


def save_cnf_checkpoint_pt(path: str, params: Any, latents, epoch: int = 0,
                           optim_states: dict | None = None) -> None:
    """Write the reference 4-part CNF checkpoint
    (``ConditionalNeuralField/scripts/train.py:468-479`` layout)."""
    torch = _torch()
    torch.save({
        "epoch": int(epoch),
        "model_state_dict": cnf_state_dict(params),
        "hidden_states": {"latents": torch.from_numpy(np.asarray(latents))},
        "optim_net_dec_dict": optim_states or {},
        "optim_states_dict": optim_states or {},
    }, path)


def save_normalizer_params_pt(path: str, x_params, y_params,
                              extra_params=None) -> None:
    torch = _torch()
    out = {
        "x_normalizer_params": tuple(torch.from_numpy(np.asarray(p))
                                     for p in x_params),
        "y_normalizer_params": tuple(torch.from_numpy(np.asarray(p))
                                     for p in y_params),
    }
    if extra_params is not None:
        out["extra_normalizer_params"] = tuple(
            torch.from_numpy(np.asarray(p)) for p in extra_params)
    torch.save(out, path)


def unet_state_dict(params: Any, model) -> dict:
    """Our UNet params -> reference ADM state dict (inverse of
    ``torch_port.unet_params_from_state_dict``)."""
    torch = _torch()
    from confild_tpu.models.unet import (AttnSpec, ConvSpec, DownSpec,
                                         ResSpec, UpSpec)
    sd: dict = {}

    def put_conv(prefix, p):
        w = np.moveaxis(np.asarray(p["kernel"]), (-1, -2), (0, 1))
        sd[f"{prefix}.weight"] = torch.from_numpy(np.ascontiguousarray(w))
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["bias"]))

    def put_gn(prefix, p):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(p["scale"]))
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["bias"]))

    def put_dense(prefix, p):
        sd[f"{prefix}.weight"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(p["kernel"]).T))
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["bias"]))

    def put_layer(prefix, p, spec):
        if isinstance(spec, ConvSpec):
            put_conv(prefix, p["conv"])
        elif isinstance(spec, ResSpec):
            put_gn(f"{prefix}.in_layers.0", p["in_norm"])
            put_conv(f"{prefix}.in_layers.2", p["in_conv"])
            put_dense(f"{prefix}.emb_layers.1", p["emb"])
            put_gn(f"{prefix}.out_layers.0", p["out_norm"])
            put_conv(f"{prefix}.out_layers.3", p["out_conv"])
            if "skip" in p:
                put_conv(f"{prefix}.skip_connection", p["skip"])
        elif isinstance(spec, AttnSpec):
            put_gn(f"{prefix}.norm", p["norm"])
            put_conv(f"{prefix}.qkv", p["qkv"])
            put_conv(f"{prefix}.proj_out", p["proj"])
        elif isinstance(spec, UpSpec):
            if "conv" in p:
                put_conv(f"{prefix}.conv", p["conv"])
        elif isinstance(spec, DownSpec):
            if "conv" in p:
                put_conv(f"{prefix}.op", p["conv"])
        else:
            raise TypeError(spec)

    put_dense("time_embed.0", params["time_embed"][0])
    put_dense("time_embed.2", params["time_embed"][1])
    for i, (bp, bs) in enumerate(zip(params["input_blocks"],
                                     model.plan.input_blocks)):
        for j, (p, spec) in enumerate(zip(bp, bs)):
            put_layer(f"input_blocks.{i}.{j}", p, spec)
    for j, (p, spec) in enumerate(zip(params["middle_block"],
                                      model.plan.middle_block)):
        put_layer(f"middle_block.{j}", p, spec)
    for i, (bp, bs) in enumerate(zip(params["output_blocks"],
                                     model.plan.output_blocks)):
        for j, (p, spec) in enumerate(zip(bp, bs)):
            put_layer(f"output_blocks.{i}.{j}", p, spec)
    put_gn("out.0", params["out_norm"])
    put_conv("out.2", params["out_conv"])
    if "label_emb" in params:
        sd["label_emb.weight"] = torch.from_numpy(
            np.asarray(params["label_emb"]["embedding"]))
    return sd


def save_unet_checkpoint_pt(path: str, params: Any, model) -> None:
    _torch().save(unet_state_dict(params, model), path)
