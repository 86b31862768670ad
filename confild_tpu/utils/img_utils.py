"""Inpainting mask generation + dynamic thresholding (reference
``ConditionalDiffusionGeneration/src/util/img_utils.py``).

Masks are built host-side with numpy (they are static sampler inputs, not
traced values) and returned as jnp arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize(img, s: float = 0.95):
    scaling = jnp.quantile(jnp.abs(img), s)
    return img * scaling


def dynamic_thresholding(img, s: float = 0.95):
    return jnp.clip(normalize(img, s), -1.0, 1.0)


def random_sq_bbox(shape, mask_shape, image_size: int = 256,
                   margin=(16, 16), rng=None):
    """Random square inpainting mask (``img_utils.py:17-34``).
    ``shape``: (B, C, H, W)."""
    rng = rng or np.random.default_rng()
    b, c, hh, ww = shape
    h, w = mask_shape
    margin_height, margin_width = margin
    maxt = image_size - margin_height - h
    maxl = image_size - margin_width - w
    t = int(rng.integers(margin_height, maxt))
    l = int(rng.integers(margin_width, maxl))
    mask = np.ones(shape, np.float32)
    mask[..., t:t + h, l:l + w] = 0
    return jnp.asarray(mask), t, t + h, l, l + w


class mask_generator:
    """box / random / extreme / std_box inpainting masks
    (``img_utils.py:36-102``)."""

    def __init__(self, mask_type: str, mask_len_range=None,
                 mask_prob_range=None, image_size: int = 256,
                 margin=(16, 16), std_box_hstart: int = 0,
                 std_box_wstart: int = 0, h: int = 1, w: int = 1, seed=None):
        assert mask_type in ("box", "random", "both", "extreme", "std_box")
        self.mask_type = mask_type
        self.mask_len_range = mask_len_range
        self.mask_prob_range = mask_prob_range
        self.image_size = image_size
        self.margin = margin
        self.std_box = (std_box_hstart, std_box_wstart, h, w)
        self.rng = np.random.default_rng(seed)

    def _retrieve_std_box(self, shape):
        t, l, h, w = self.std_box
        mask = np.ones(shape, np.float32)
        mask[..., t:t + h, l:l + w] = 0
        return jnp.asarray(mask)

    def _retrieve_box(self, shape):
        lo, hi = map(int, self.mask_len_range)
        mask_h = int(self.rng.integers(lo, hi))
        mask_w = int(self.rng.integers(lo, hi))
        return random_sq_bbox(shape, (mask_h, mask_w), self.image_size,
                              self.margin, self.rng)

    def _retrieve_random(self, shape):
        total = self.image_size ** 2
        lo, hi = self.mask_prob_range
        prob = float(self.rng.uniform(lo, hi))
        mask_vec = np.ones(total, np.float32)
        samples = self.rng.choice(total, int(total * prob), replace=False)
        mask_vec[samples] = 0
        mask_b = mask_vec.reshape(self.image_size, self.image_size)
        mask = np.broadcast_to(mask_b, shape).copy()
        return jnp.asarray(mask)

    def __call__(self, img_or_shape):
        shape = (img_or_shape if isinstance(img_or_shape, tuple)
                 else tuple(img_or_shape.shape))
        if self.mask_type == "random":
            return self._retrieve_random(shape)
        if self.mask_type == "box":
            return self._retrieve_box(shape)[0]
        if self.mask_type == "extreme":
            return 1.0 - self._retrieve_box(shape)[0]
        if self.mask_type == "std_box":
            return self._retrieve_std_box(shape)
        raise NotImplementedError(self.mask_type)


def bicubic_resize(img, scale_factor: float):
    """Differentiable resize (the reference ships a PIL-free bicubic/lanczos
    ``Resizer``, ``src/util/resizer.py``; jax.image provides the same
    contract natively).  Channels-first (B, C, H, W)."""
    import jax
    b, c, h, w = img.shape
    new_h, new_w = int(h * scale_factor), int(w * scale_factor)
    return jax.image.resize(img, (b, c, new_h, new_w), method="cubic")
