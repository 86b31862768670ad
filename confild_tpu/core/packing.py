"""Latent <-> image packing, coordinate grids and mask scatter.

The diffusion stage treats a trajectory's latent sequence ``(T, L)`` as a
1-channel square "image" ``(B, 1, T, L)`` (reference ``README.md:161-163``,
``scripts/inference.py:55-56``).  ``reconstruct_frame`` scatters flat
mesh-point decodes back onto a dense grid through a geometry mask (reference
``cnf/inference_function.py:15-19``).  Coordinate grids are unit-cube
meshgrids with ``ij`` indexing (``inference_function.py:266-304``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def pack_latents(latents):
    """``(B, T, L) -> (B, 1, T, L)`` channel-first latent image."""
    return latents[:, None, :, :]


def unpack_latents(images):
    """``(B, 1, T, L) -> (B, T, L)``."""
    assert images.shape[1] == 1, f"expected 1-channel latent image, got {images.shape}"
    return images[:, 0, :, :]


def create_coordinates_grid(shape: Sequence[int], dtype=np.float32) -> np.ndarray:
    """Unit-cube coordinate grid: ``shape=(H, W, ...) -> (H, W, ..., ndim)``."""
    axes = [np.linspace(0.0, 1.0, s, dtype=dtype) for s in shape]
    return np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)


def flatten_grid(coords: np.ndarray) -> np.ndarray:
    """``(H, W, ..., d) -> (H*W*..., d)``."""
    return coords.reshape(-1, coords.shape[-1])


def reconstruct_frame(flat_values, mask, shape: Sequence[int], fill_value=0.0):
    """Scatter flat per-mesh-point values into a dense grid.

    ``mask`` is a boolean array of ``shape`` selecting the mesh points in
    row-major order; ``flat_values`` has shape ``(n_points, C)``.  Returns an
    array of ``(*shape, C)`` with ``fill_value`` outside the geometry.
    """
    # The mask is static geometry: compute scatter indices on the host so the
    # jitted scatter has static shapes.
    mask_np = np.asarray(mask, dtype=bool).reshape(-1)
    idx = np.nonzero(mask_np)[0]
    flat_values = jnp.asarray(flat_values)
    assert flat_values.shape[0] == idx.shape[0], (
        f"{flat_values.shape[0]} values for {idx.shape[0]} masked cells")
    out = jnp.full((mask_np.shape[0], flat_values.shape[-1]), fill_value,
                   dtype=flat_values.dtype)
    out = out.at[idx].set(flat_values)
    return out.reshape(*shape, flat_values.shape[-1])


def minmax_to_unit_interval(data, data_max, data_min):
    """Global min-max -> [-1, 1] (diffusion training data contract,
    reference ``scripts/train.py:47-49``)."""
    return (data - data_min) / (data_max - data_min) * 2.0 - 1.0


def unit_interval_to_minmax(data_norm, data_max, data_min):
    """[-1, 1] -> original range (reference ``scripts/inference.py:59-61``,
    ``measurements.py:88-89``)."""
    return (data_norm + 1.0) * (data_max - data_min) / 2.0 + data_min
