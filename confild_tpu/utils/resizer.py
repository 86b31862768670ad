"""Differentiable separable resize (MATLAB-imresize semantics).

TPU-native re-design of the reference ``Resizer`` module
(``ConditionalDiffusionGeneration/src/util/resizer.py:8-197``, itself the
public assafshocher/resizer algorithm): all index/weight planning happens
once on the host in numpy; the apply is a pure jittable/differentiable
function — one gather + weighted reduction per resized dimension, which XLA
fuses into a single pass per axis.

Semantics matched to the reference:
  * center-preserving coordinate map ``p_new = p_old/sf + 0.5*(1 - 1/sf)``
    with an extra shift when ``output_shape`` disagrees with
    ``in_shape * scale`` (equal margins both sides);
  * antialiasing (kernel stretched by 1/sf) only when downscaling;
  * reflection padding at the borders via the mirrored-index trick;
  * weights renormalized to sum to 1 per output pixel, all-zero columns
    dropped;
  * dims resized one at a time in increasing-scale order, dims with
    scale 1 skipped.

Kernels: ``cubic`` (default, Keys a=-0.5), ``lanczos2``, ``lanczos3``,
``box``, ``linear``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def _cubic(x):
    ax = np.abs(x)
    ax2, ax3 = ax ** 2, ax ** 3
    return ((1.5 * ax3 - 2.5 * ax2 + 1.0) * (ax <= 1) +
            (-0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0) * ((ax > 1) & (ax <= 2)))


def _lanczos(x, a):
    num = np.sin(math.pi * x) * np.sin(math.pi * x / a) + _EPS
    den = (math.pi ** 2) * (x ** 2) / a + _EPS
    return (num / den) * (np.abs(x) < a)


def _box(x):
    return ((x >= -0.5) & (x < 0.5)).astype(np.float64)


def _linear(x):
    return ((x + 1) * ((x >= -1) & (x < 0)) +
            (1 - x) * ((x >= 0) & (x <= 1)))


_KERNELS = {
    "cubic": (_cubic, 4.0),
    "lanczos2": (lambda x: _lanczos(x, 2.0), 4.0),
    "lanczos3": (lambda x: _lanczos(x, 3.0), 6.0),
    "box": (_box, 1.0),
    "linear": (_linear, 2.0),
    None: (_cubic, 4.0),
}


def _fix_scale_and_size(in_shape, output_shape, scale_factor):
    """Reference ``fix_scale_and_size`` contract (resizer.py:77-103)."""
    if scale_factor is not None:
        if np.isscalar(scale_factor) and len(in_shape) > 1:
            scale_factor = [scale_factor, scale_factor]
        scale_factor = list(scale_factor)
        scale_factor = ([1] * (len(in_shape) - len(scale_factor))
                        + scale_factor)
    if output_shape is not None:
        output_shape = (list(in_shape[len(output_shape):])
                        + [int(v) for v in output_shape])
    if scale_factor is None:
        scale_factor = [o / i for o, i in zip(output_shape, in_shape)]
    if output_shape is None:
        output_shape = [int(np.ceil(i * s))
                        for i, s in zip(in_shape, scale_factor)]
    return scale_factor, output_shape


def _plan_dim(in_length, out_length, scale, kernel, kernel_width,
              antialiasing):
    """Per-axis (weights, indices) plan — reference ``contributions``
    (resizer.py:105-168). Returns float32 (out, k) weights and int32 (out, k)
    mirrored input indices."""
    # NB: the reference applies the stretch with the PER-DIM scale whenever
    # the global antialias flag is on (any dim downscaling), even if this
    # dim upscales — matched here, quirk included (resizer.py:112-114)
    if antialiasing:
        kern = lambda a: scale * kernel(scale * a)  # noqa: E731
        kernel_width = kernel_width / scale
    else:
        kern = kernel

    out_coords = np.arange(1, out_length + 1, dtype=np.float64)
    # equal-margin shift when out_length != in_length*scale
    out_coords = out_coords - (out_length - in_length * scale) / 2
    match = out_coords / scale + 0.5 * (1 - 1 / scale)

    left = np.floor(match - kernel_width / 2)
    k = int(np.ceil(kernel_width)) + 2
    fov = (left[:, None] + np.arange(k) - 1).astype(np.int64)
    weights = kern(match[:, None] - fov - 1)

    ws = weights.sum(axis=1)
    ws[ws == 0] = 1.0
    weights = weights / ws[:, None]

    # reflection padding: fold indices through the mirrored ramp
    mirror = np.concatenate(
        [np.arange(in_length), np.arange(in_length - 1, -1, -1)])
    fov = mirror[np.mod(fov, mirror.shape[0])]

    keep = np.any(weights != 0, axis=0)
    return (weights[:, keep].astype(np.float32),
            fov[:, keep].astype(np.int32))


class Resizer:
    """Callable resize plan: ``Resizer(in_shape, ...)(x)``.

    ``x`` may be a jnp or np array of shape ``in_shape``; the output is a jnp
    array and the call is differentiable and jit-safe (all plan data are
    static numpy constants closed over by the traced function).
    """

    def __init__(self, in_shape, scale_factor=None, output_shape=None,
                 kernel: str | None = None, antialiasing: bool = True):
        if kernel not in _KERNELS:
            raise ValueError(f"unknown resize kernel: {kernel!r}")
        kern, kernel_width = _KERNELS[kernel]
        scale_factor, output_shape = _fix_scale_and_size(
            tuple(in_shape), output_shape, scale_factor)
        self.in_shape = tuple(in_shape)
        self.output_shape = tuple(int(v) for v in output_shape)
        self.scale_factor = tuple(float(s) for s in scale_factor)

        antialiasing = bool(antialiasing) and any(
            s < 1 for s in self.scale_factor)
        order = np.argsort(np.array(self.scale_factor))
        self._plans = []
        for dim in order:
            dim = int(dim)
            if self.scale_factor[dim] == 1:
                continue
            w, fov = _plan_dim(self.in_shape[dim], self.output_shape[dim],
                               self.scale_factor[dim], kern, kernel_width,
                               antialiasing)
            self._plans.append((dim, w, fov))

    def __call__(self, x):
        x = jnp.asarray(x)
        for dim, w, fov in self._plans:
            xt = jnp.moveaxis(x, dim, 0)
            # gather the k contributing rows per output pixel and reduce:
            # (out, k, *rest) * (out, k, 1...) summed over k
            g = jnp.take(xt, jnp.asarray(fov), axis=0)
            wb = jnp.asarray(w, dtype=g.dtype).reshape(
                w.shape + (1,) * (g.ndim - 2))
            xt = jnp.sum(g * wb, axis=1)
            x = jnp.moveaxis(xt, 0, dim)
        return x
