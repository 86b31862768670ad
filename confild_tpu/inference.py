"""CNF inference API (reference ``ConditionalNeuralField/cnf/
inference_function.py``): batched decoding helpers and the checkpoint-driven
``CNF_inference`` convenience class.

TPU-native: the decode itself is the fused Pallas kernel
(:mod:`confild_tpu.ops.siren_decode`); batching over latent rows streams
row-chunks through one compiled program (static chunk shape -> one
compilation, remainder handled by padding).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from confild_tpu.core import normalize as cnorm
from confild_tpu.core.packing import (create_coordinates_grid,
                                      reconstruct_frame)
from confild_tpu.ops.siren_decode import siren_decode

# re-export under the reference name
ReconstructFrame = reconstruct_frame


def pass_through_model_batch(coords, latents, params, x_normalizer,
                             y_normalizer, batch_size: int = 16,
                             use_pallas: bool = True, w0: float = 30.0):
    """Differentiable batched decode: ``(T, L) x (M, C) -> (T, M, C_out)``
    (reference ``inference_function.py:22-48``).

    Stays on device and in the autodiff graph (the DPS operators call this).
    Rows are processed in ``batch_size`` chunks of static shape.
    """
    coords = x_normalizer.normalize(jnp.asarray(coords))
    latents = jnp.asarray(latents)
    t = latents.shape[0]

    outs = []
    for sid in range(0, t, batch_size):
        rows = latents[sid: min(sid + batch_size, t)]
        out = siren_decode(params, coords, rows, w0=w0, use_pallas=use_pallas)
        outs.append(y_normalizer.denormalize(out))
    return jnp.concatenate(outs, axis=0)


def decoder(coords, latents, params, x_normalizer, y_normalizer,
            batch_size: int = 16, use_pallas: bool = True, w0: float = 30.0):
    """Non-differentiable streaming decode: chunks are pulled to host numpy as
    they finish so arbitrarily many rows fit (reference
    ``inference_function.py:51-76`` streams to CPU)."""
    coords = x_normalizer.normalize(jnp.asarray(coords))
    latents = jnp.asarray(latents)
    t = latents.shape[0]

    decode = jax.jit(lambda rows: y_normalizer.denormalize(
        siren_decode(params, coords, rows, w0=w0, use_pallas=use_pallas)))

    outs = []
    for sid in range(0, t, batch_size):
        rows = jax.lax.stop_gradient(latents[sid: min(sid + batch_size, t)])
        # pad the tail chunk to the static shape so one compilation serves all
        pad = batch_size - rows.shape[0]
        if pad:
            rows = jnp.pad(rows, ((0, pad), (0, 0)))
        out = np.asarray(decode(rows))
        outs.append(out[: batch_size - pad if pad else batch_size])
    return np.concatenate(outs, axis=0)


class CNF_inference:
    """Load a trained CNF (checkpoint + recipe + normalizers) and decode.

    Accepts both framework ``.ckpt`` checkpoints and reference ``.pt`` files,
    including the published-checkpoint raw-tensor latent layout (``is_pub``,
    reference ``inference_function.py:182-212``).
    """

    def __init__(self, checkpoint_path: str, config_path: str,
                 data_path: str | None = None, is_pub: bool = False,
                 use_pallas: bool = True):
        self.use_pallas = use_pallas
        with open(config_path) as f:
            self.config = yaml.safe_load(f)

        # normalizers live next to the checkpoint (hard requirement,
        # reference :147-159)
        ckpt_dir = os.path.dirname(os.path.abspath(checkpoint_path))
        norm_ckpt = os.path.join(ckpt_dir, "normalizer_params.ckpt")
        norm_pt = os.path.join(ckpt_dir, "normalizer_params.pt")
        if os.path.exists(norm_ckpt):
            from confild_tpu.io.checkpoint import load_pytree
            p = load_pytree(norm_ckpt)
            x_par = tuple(p["x_normalizer_params"])
            y_par = tuple(p["y_normalizer_params"])
        elif os.path.exists(norm_pt):
            from confild_tpu.io.torch_port import load_normalizer_params
            p = load_normalizer_params(norm_pt)
            x_par, y_par = p["x"], p["y"]
        else:
            raise FileNotFoundError(
                f"normalizer_params not found next to {checkpoint_path}")
        self.x_normalizer = cnorm.Normalizer(x_par, "-11", 0).as_jax()
        self.y_normalizer = cnorm.Normalizer(y_par, "-11", 0).as_jax()

        self._load_model(checkpoint_path, is_pub)

        self.data = np.load(data_path) if data_path else None

    def _load_model(self, checkpoint_path: str, is_pub: bool):
        from confild_tpu.models import cnf as cnf_models

        if checkpoint_path.endswith(".pt"):
            from confild_tpu.io.torch_port import load_cnf_checkpoint
            ck = load_cnf_checkpoint(checkpoint_path)
            self.params = jax.tree.map(jnp.asarray, ck["params"])
            self.latents = jnp.asarray(ck["latents"]) if "latents" in ck else None
        else:
            from confild_tpu.io.checkpoint import load_pytree
            ck = load_pytree(checkpoint_path)
            self.params = jax.tree.map(jnp.asarray, ck["model_state_dict"])
            hs = ck.get("hidden_states")
            if hs is not None:
                lat = hs["latents"] if isinstance(hs, dict) else hs
                self.latents = jnp.asarray(np.asarray(lat).reshape(
                    np.asarray(lat).shape[0], -1))
            else:
                self.latents = None

        nf = self.config["NF"]
        self.model = cnf_models.create_nf(
            nf["name"],
            in_coord_features=self.config["dims"],
            in_latent_features=self.config["hidden_size"],
            out_features=nf.get("out_features",
                                nf.get("kwargs", {}).get("out_features")),
            num_hidden_layers=nf.get("num_hidden_layers",
                                     nf.get("kwargs", {}).get("num_hidden_layers")),
            hidden_features=nf.get("hidden_features",
                                   nf.get("kwargs", {}).get("hidden_features")),
        )

    def predict(self, coords, latent_indices: Sequence[int] | None = None,
                batch_size: int = 16) -> np.ndarray:
        """Decode stored latents at physical coords (reference :219-259)."""
        latents = (self.latents if latent_indices is None
                   else self.latents[jnp.asarray(latent_indices)])
        return decoder(coords, latents, self.params, self.x_normalizer,
                       self.y_normalizer, batch_size,
                       use_pallas=self.use_pallas)

    def get_all_predictions(self, coords, batch_size: int = 16) -> np.ndarray:
        return self.predict(coords, None, batch_size)

    def create_coordinates_grid(self, shape: Sequence[int] | None = None):
        """Unit-cube grid; shape inferred from data when omitted
        (reference :266-304)."""
        if shape is None:
            if self.data is None:
                raise ValueError("need data or an explicit shape")
            shape = self.data.shape[1:-1]
        return create_coordinates_grid(shape)
