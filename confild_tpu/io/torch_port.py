"""PyTorch checkpoint porting: read ``.pt`` files into numpy pytrees and remap
reference state-dict layouts onto this framework's parameter conventions.

Layout facts this module encodes (so Zenodo reference checkpoints port
bit-for-bit):

* ``BatchLinear`` stores ``(out, in)`` weights applied as ``x @ W^T``
  (reference ``cnf/components.py:55-76``) -> transpose to our ``(in, out)``
  kernels.
* CNF checkpoints are a dict with ``model_state_dict``, ``hidden_states``
  (latent table module state or, for published checkpoints, a raw tensor),
  both optimizer states and ``epoch`` (reference
  ``ConditionalNeuralField/scripts/train.py:468-479``; ``is_pub`` layout at
  ``cnf/inference_function.py:182-212``).
* ``normalizer_params.pt`` holds ``x_normalizer_params`` /
  ``y_normalizer_params`` tuples (``scripts/train.py:204-213``).
* torch convs store ``(out, in, *k)`` -> transposed to the JAX
  ``(*k, in, out)`` convention by the UNet mapping.

Reading uses a torch-free zipfile+pickle parser (works without a torch
runtime); falls back to ``torch.load`` for legacy serialization formats.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any

import numpy as np

# torch dtype name -> (numpy dtype, element size)
_DTYPE_MAP = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled specially
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _FakeTensor:
    """Stand-in for torch.Tensor rebuilt from storage + view metadata."""

    def __init__(self, array: np.ndarray):
        self.array = array

    def __repr__(self):  # pragma: no cover
        return f"_FakeTensor{self.array.shape}"


def _rebuild_tensor(storage, storage_offset, size, stride, *_args, **_kw):
    arr = storage["data"]
    if len(size) == 0:
        return _FakeTensor(arr[storage_offset:storage_offset + 1].reshape(()))
    itemsize = arr.itemsize
    strides = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=tuple(size), strides=strides, writeable=False
    )
    return _FakeTensor(np.array(view))  # copy to own the memory


class _AttrDict(dict):
    """dict that tolerates instance attributes (torch state_dicts pickle an
    OrderedDict carrying a ``_metadata`` attribute)."""


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2" or name == "_rebuild_tensor":
            return _rebuild_tensor
        if name == "_rebuild_parameter":
            return lambda data, requires_grad, hooks: data
        if module == "torch" and name in _DTYPE_MAP:
            return name  # storage type tag
        if module == "collections" and name == "OrderedDict":
            return _AttrDict
        if module == "torch" and name in ("Size",):
            return tuple
        # Anything else in a checkpoint we don't need to execute; return an
        # inert placeholder type.
        return type(name, (), {"__module__": module, "__setstate__": lambda s, x: None})

    def persistent_load(self, pid):
        # pid = ('storage', storage_type_tag, key, location, numel)
        assert pid[0] == "storage", f"unknown persistent id {pid!r}"
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        name = storage_type if isinstance(storage_type, str) else storage_type.__name__
        with self._zf.open(f"{self._prefix}/data/{key}") as f:
            raw = f.read()
        if name == "BFloat16Storage":
            u16 = np.frombuffer(raw, dtype=np.uint16)
            u32 = u16.astype(np.uint32) << 16
            data = u32.view(np.float32).copy()
        else:
            dtype = _DTYPE_MAP[name]
            data = np.frombuffer(raw, dtype=dtype).copy()
        assert data.shape[0] >= numel or numel == 0
        return {"data": data}


def _to_numpy_tree(obj: Any) -> Any:
    if isinstance(obj, _FakeTensor):
        return obj.array
    if isinstance(obj, dict):
        return {k: _to_numpy_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        seq = [_to_numpy_tree(v) for v in obj]
        return type(obj)(seq) if isinstance(obj, tuple) else seq
    return obj


def load_torch_checkpoint(path: str) -> Any:
    """Load a ``.pt`` checkpoint as a nested dict/list pytree of numpy arrays."""
    try:
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
            pkl_name = next(n for n in names if n.endswith("data.pkl"))
            prefix = pkl_name[: -len("/data.pkl")]
            with zf.open(pkl_name) as f:
                obj = _TorchUnpickler(io.BytesIO(f.read()), zf, prefix).load()
        return _to_numpy_tree(obj)
    except zipfile.BadZipFile:
        # Legacy (pre-1.6) serialization: fall back to torch if present.
        import torch  # noqa: deferred heavy import

        ckpt = torch.load(path, map_location="cpu", weights_only=False)

        def conv(o):
            if isinstance(o, torch.Tensor):
                return o.detach().cpu().numpy()
            if isinstance(o, dict):
                return {k: conv(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                s = [conv(v) for v in o]
                return type(o)(s) if isinstance(o, tuple) else s
            return o

        return conv(ckpt)


# ---------------------------------------------------------------------------
# CNF state-dict mapping
# ---------------------------------------------------------------------------

def siren_film_params_from_state_dict(sd: dict) -> dict:
    """Map ``net1.i.weight/bias`` + ``net2.i.weight`` onto our param pytree.

    Transposes ``(out, in) -> (in, out)`` per the ``x @ W^T`` BatchLinear
    contract (``cnf/components.py:71``)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    n1 = max(int(k.split(".")[1]) for k in sd if k.startswith("net1.")) + 1
    n2 = max(int(k.split(".")[1]) for k in sd if k.startswith("net2.")) + 1
    net1 = []
    for i in range(n1):
        layer = {"kernel": np.ascontiguousarray(sd[f"net1.{i}.weight"].T)}
        if f"net1.{i}.bias" in sd:
            layer["bias"] = sd[f"net1.{i}.bias"]
        net1.append(layer)
    net2 = []
    for i in range(n2):
        net2.append({"kernel": np.ascontiguousarray(sd[f"net2.{i}.weight"].T)})
    return {"net1": net1, "net2": net2}


def latents_from_hidden_states(hidden_states) -> np.ndarray:
    """Latent table from a checkpoint ``hidden_states`` entry, handling both
    the module-state layout ``{"latents": (N, F)}`` and the published raw
    tensor layout (``inference_function.py:182-212``)."""
    if isinstance(hidden_states, dict):
        if "latents" in hidden_states:
            return np.asarray(hidden_states["latents"])
        # published layout sometimes nests one level
        (val,) = hidden_states.values()
        return np.asarray(val)
    arr = np.asarray(hidden_states)
    # published raw tensors may carry broadcast singleton dims: (N, 1, ..., F)
    if arr.ndim > 2:
        arr = arr.reshape(arr.shape[0], arr.shape[-1])
    return arr


def load_cnf_checkpoint(path: str) -> dict:
    """Load a CNF training checkpoint into framework-native structures."""
    ckpt = load_torch_checkpoint(path)
    out = {
        "params": siren_film_params_from_state_dict(ckpt["model_state_dict"]),
        "epoch": ckpt.get("epoch"),
    }
    if "hidden_states" in ckpt:
        out["latents"] = latents_from_hidden_states(ckpt["hidden_states"])
    return out


def load_normalizer_params(path: str) -> dict:
    """Read ``normalizer_params.pt`` -> {'x': (a, b), 'y': (a, b), ...}."""
    raw = load_torch_checkpoint(path)
    out = {}
    for key, val in raw.items():
        short = key.replace("_normalizer_params", "")
        out[short] = tuple(np.asarray(v) for v in val)
    return out


# ---------------------------------------------------------------------------
# UNet state-dict mapping
# ---------------------------------------------------------------------------

def _conv_params(sd: dict, prefix: str) -> dict:
    """torch conv ``(out, in, *k)`` -> JAX ``(*k, in, out)``."""
    w = sd[f"{prefix}.weight"]
    kernel = np.ascontiguousarray(np.moveaxis(w, (0, 1), (-1, -2)))
    return {"kernel": kernel, "bias": sd[f"{prefix}.bias"]}


def _gn_params(sd: dict, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _dense_params(sd: dict, prefix: str) -> dict:
    return {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
            "bias": sd[f"{prefix}.bias"]}


def _unet_layer_params(sd: dict, prefix: str, spec) -> dict:
    # local import: models.unet pulls jax; keep this module importable alone
    from confild_tpu.models.unet import (AttnSpec, ConvSpec, DownSpec, ResSpec,
                                         UpSpec)

    if isinstance(spec, ConvSpec):
        return {"conv": _conv_params(sd, prefix)}
    if isinstance(spec, ResSpec):
        p = {
            "in_norm": _gn_params(sd, f"{prefix}.in_layers.0"),
            "in_conv": _conv_params(sd, f"{prefix}.in_layers.2"),
            "emb": _dense_params(sd, f"{prefix}.emb_layers.1"),
            "out_norm": _gn_params(sd, f"{prefix}.out_layers.0"),
            "out_conv": _conv_params(sd, f"{prefix}.out_layers.3"),
        }
        if f"{prefix}.skip_connection.weight" in sd:
            p["skip"] = _conv_params(sd, f"{prefix}.skip_connection")
        return p
    if isinstance(spec, AttnSpec):
        return {
            "norm": _gn_params(sd, f"{prefix}.norm"),
            "qkv": _conv_params(sd, f"{prefix}.qkv"),
            "proj": _conv_params(sd, f"{prefix}.proj_out"),
        }
    if isinstance(spec, UpSpec):
        return ({"conv": _conv_params(sd, f"{prefix}.conv")}
                if f"{prefix}.conv.weight" in sd else {})
    if isinstance(spec, DownSpec):
        return ({"conv": _conv_params(sd, f"{prefix}.op")}
                if f"{prefix}.op.weight" in sd else {})
    raise TypeError(spec)


def unet_params_from_state_dict(sd: dict, model) -> dict:
    """Map an ADM UNet torch state dict (reference ``src/unet.py:396-663``
    module tree) onto :class:`confild_tpu.models.unet.UNetModel` params."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    plan = model.plan
    params = {
        "time_embed": [_dense_params(sd, "time_embed.0"),
                       _dense_params(sd, "time_embed.2")],
        "input_blocks": [
            [_unet_layer_params(sd, f"input_blocks.{i}.{j}", spec)
             for j, spec in enumerate(block)]
            for i, block in enumerate(plan.input_blocks)
        ],
        "middle_block": [
            _unet_layer_params(sd, f"middle_block.{j}", spec)
            for j, spec in enumerate(plan.middle_block)
        ],
        "output_blocks": [
            [_unet_layer_params(sd, f"output_blocks.{i}.{j}", spec)
             for j, spec in enumerate(block)]
            for i, block in enumerate(plan.output_blocks)
        ],
        "out_norm": _gn_params(sd, "out.0"),
        "out_conv": _conv_params(sd, "out.2"),
    }
    if "label_emb.weight" in sd:
        params["label_emb"] = {"embedding": sd["label_emb.weight"]}
    return params


def load_unet_checkpoint(path: str, model) -> dict:
    """Load a diffusion model/EMA ``.pt`` file (a bare state dict, reference
    ``train_util.py:272-295``) into UNet params."""
    sd = load_torch_checkpoint(path)
    return unet_params_from_state_dict(sd, model)
