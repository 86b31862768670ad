"""CoNFiLD-TPU: a TPU-native (JAX/XLA/Pallas) conditional neural field latent
diffusion framework.

Re-designed from scratch for TPU hardware with the capabilities of the CoNFiLD
reference (Du et al., Nature Communications 15, 10416 (2024)):

* Stage 1 — Conditional Neural Field (SIREN auto-decoder with FiLM latent
  modulation) fit by auto-decoding.  See :mod:`confild_tpu.models.cnf` and
  :mod:`confild_tpu.train.cnf_trainer`.
* Stage 2 — latent diffusion with an ADM U-Net over latent "images".
  See :mod:`confild_tpu.models.unet` and :mod:`confild_tpu.diffusion`.
* Stage 3 — zero-shot conditional generation via diffusion posterior sampling
  (DPS) with a differentiable CNF decode as the measurement operator.
  See :mod:`confild_tpu.guidance`.

The package is one framework (single implementations, no per-stage copies)
with thin workflow entry points in :mod:`confild_tpu.cli`.
"""

__version__ = "0.1.0"

from confild_tpu.config import basic_input  # noqa: F401


def __getattr__(name):
    # lazy submodule access: confild_tpu.models, .diffusion, ... without
    # paying import cost (jax trace-time setup) at package import
    import importlib
    if name in ("models", "diffusion", "guidance", "train", "parallel",
                "ops", "core", "io", "utils", "analysis", "inference",
                "config"):
        return importlib.import_module(f"confild_tpu.{name}")
    raise AttributeError(f"module 'confild_tpu' has no attribute {name!r}")
