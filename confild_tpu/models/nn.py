"""NN primitives for the diffusion U-Net (reference
``UnconditionalDiffusionTraining_and_Generation/src/nn.py``).

TPU conventions: tensors are channels-last (``(B, *spatial, C)``) so convs map
directly onto XLA's native NHWC path; the public U-Net API converts from the
reference's NCHW contract at the boundary.  Normalizations run in float32
regardless of the activation dtype (the reference's ``GroupNorm32``).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embeddings, ``cos`` then ``sin`` halves exactly as
    the reference (``src/nn.py:118-136``)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch dims."""
    return x.mean(axis=tuple(range(1, x.ndim)))


# ---------------------------------------------------------------------------
# dense / conv params + apply (channels-last)
# ---------------------------------------------------------------------------

def init_dense(key, in_features: int, out_features: int, *, zero: bool = False,
               dtype=jnp.float32) -> dict:
    """torch nn.Linear default init: kaiming-uniform(a=sqrt(5)) == uniform
    ±1/sqrt(in) for weights and bias."""
    if zero:
        return {"kernel": jnp.zeros((in_features, out_features), dtype),
                "bias": jnp.zeros((out_features,), dtype)}
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    return {
        "kernel": jax.random.uniform(wkey, (in_features, out_features), dtype,
                                     -bound, bound),
        "bias": jax.random.uniform(bkey, (out_features,), dtype, -bound, bound),
    }


def dense(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["kernel"].astype(x.dtype) + params["bias"].astype(x.dtype)


def init_conv(key, dims: int, in_ch: int, out_ch: int, kernel_size: int = 3,
              *, zero: bool = False, dtype=jnp.float32) -> dict:
    """Conv param init matching torch's Conv_nd default (kaiming-uniform
    a=sqrt(5) -> uniform ±1/sqrt(fan_in)).  Kernel layout: ``(*k, in, out)``
    (HWIO), the XLA-native layout; the torch port transposes OIHW."""
    k = (kernel_size,) * dims
    fan_in = in_ch * int(np.prod(k))
    shape = (*k, in_ch, out_ch)
    if zero:
        return {"kernel": jnp.zeros(shape, dtype),
                "bias": jnp.zeros((out_ch,), dtype)}
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(wkey, shape, dtype, -bound, bound),
        "bias": jax.random.uniform(bkey, (out_ch,), dtype, -bound, bound),
    }


_CONV_DIMNUMS = {
    1: ("NWC", "WIO", "NWC"),
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


# Opt-in backward rewrite for 2-d stride-1 SAME convs: express the data- and
# weight-grads as k*k shifted matmuls instead of XLA's transposed-conv
# emission.  Motivation (r04 bwd HLO, tools/bwd_hlo.py): at batch 1 the TPU
# conv emitter places a spatial dim in the sublanes and the backward becomes
# ~half layout copies/pads (retiling 49<->50-tile buffers around every conv
# data-grad at ds1/ds2).  A pad+slice+dot decomposition gives XLA plain
# lane-major [N*H*W, C] x [C, C'] dots with no spatial retiling.  Forward is
# untouched (the fwd conv emitter is fine); grads are bit-comparable to
# autodiff up to f32-accumulator reassociation.  Enable per-process via
# set_conv_bwd_mode("mm") or CONFILD_CONV_BWD=mm.
_CONV_BWD_MODE = os.environ.get("CONFILD_CONV_BWD", "xla")


def set_conv_bwd_mode(mode: str) -> None:
    """``"xla"`` (default autodiff) or ``"mm"`` (shifted-matmul backward)."""
    global _CONV_BWD_MODE
    if mode not in ("xla", "mm"):
        raise ValueError(f"conv bwd mode {mode!r} not in ('xla', 'mm')")
    _CONV_BWD_MODE = mode


def _conv2d_same(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=_CONV_DIMNUMS[2])


@jax.custom_vjp
def _conv2d_same_mm(x, kernel):
    """2-d stride-1 SAME conv (odd kernel) with a matmul-form backward."""
    return _conv2d_same(x, kernel)


def _conv2d_same_mm_fwd(x, kernel):
    return _conv2d_same(x, kernel), (x, kernel)


def _conv2d_same_mm_bwd(res, dy):
    x, kernel = res
    kh, kw, cin, cout = kernel.shape
    ch, cw = kh // 2, kw // 2
    n, h, w, _ = x.shape
    pad = [(0, 0), (ch, ch), (cw, cw), (0, 0)]
    # dx[p,q] = sum_{a,b} dy[p-a+ch, q-b+cw] @ W[a,b]^T  (zero-padded dy)
    dyp = jnp.pad(dy, pad)
    dy2 = dy.reshape(n * h * w, cout)
    xp = jnp.pad(x, pad)
    dx = jnp.zeros((n * h * w, cin), dy.dtype)
    dk = jnp.zeros((kh, kw, cin, cout), jnp.float32)
    for a in range(kh):
        for b in range(kw):
            sl = dyp[:, 2 * ch - a:2 * ch - a + h,
                     2 * cw - b:2 * cw - b + w, :].reshape(n * h * w, cout)
            dx = dx + jax.lax.dot(
                sl, kernel[a, b].T.astype(dy.dtype),
                preferred_element_type=dx.dtype)
            # dW[a,b] = x[p+a-ch, q+b-cw]^T @ dy[p,q]
            xs = xp[:, a:a + h, b:b + w, :].reshape(n * h * w, cin)
            dk = dk.at[a, b].set(jax.lax.dot(
                xs.T, dy2, preferred_element_type=jnp.float32))
    return dx.reshape(x.shape), dk.astype(kernel.dtype)


_conv2d_same_mm.defvjp(_conv2d_same_mm_fwd, _conv2d_same_mm_bwd)


def conv(params: dict, x: jnp.ndarray, *, stride: int | Sequence[int] = 1,
         padding: str | int = "SAME") -> jnp.ndarray:
    """Channels-last n-d convolution (n inferred from the kernel rank)."""
    kernel = params["kernel"].astype(x.dtype)
    dims = kernel.ndim - 2
    if isinstance(stride, int):
        stride = (stride,) * dims
    if isinstance(padding, int):
        padding = [(padding, padding)] * dims
    if (_CONV_BWD_MODE == "mm" and dims == 2 and tuple(stride) == (1, 1)
            and padding == "SAME" and kernel.shape[0] % 2
            and kernel.shape[1] % 2):
        out = _conv2d_same_mm(x, kernel)
    else:
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=tuple(stride), padding=padding,
            dimension_numbers=_CONV_DIMNUMS[dims],
        )
    return out + params["bias"].astype(x.dtype)


def avg_pool(x: jnp.ndarray, window: Sequence[int]) -> jnp.ndarray:
    """Average pool with stride == window (channels-last)."""
    dims = len(window)
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *window, 1),
        padding="VALID",
    )
    return out / float(np.prod(window))


# ---------------------------------------------------------------------------
# GroupNorm32
# ---------------------------------------------------------------------------

def init_group_norm(channels: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((channels,), dtype),
            "bias": jnp.zeros((channels,), dtype)}


def _gn_moments(x: jnp.ndarray, g: int, eps: float):
    """Per-group (mean, rsqrt(var+eps)) as (B, g, 1) f32 arrays.

    Lane-preserving: the heavy reduction runs per-channel over the spatial
    axes only (channels sit in the lane dimension) and the cross-channel
    group combine happens on the tiny ``(B, C)`` moment arrays.  Reshaping
    the full tensor to ``(..., g, c/g)`` and reducing the minor axis makes
    XLA transpose the whole activation to get groups out of the lanes:
    measured 2x the entire UNet forward pass at Case4 scale (384^2x128)."""
    b, c = x.shape[0], x.shape[-1]
    n = int(np.prod(x.shape[1:-1])) * (c // g)
    xf = x.astype(jnp.float32)
    red = tuple(range(1, x.ndim - 1))
    s1 = jnp.sum(xf, axis=red)                  # (B, C)
    s2 = jnp.sum(jnp.square(xf), axis=red)      # (B, C)
    mean = s1.reshape(b, g, c // g).sum(-1, keepdims=True) / n
    # E[x^2] - E[x]^2 can dip below zero from f32 cancellation on
    # near-constant groups with large mean; the true variance is >= 0
    var = jnp.maximum(
        s2.reshape(b, g, c // g).sum(-1, keepdims=True) / n - mean * mean,
        0.0)
    # tagged so a remat policy can carry the tiny (B, g, 1) moments across
    # the checkpoint boundary ("matmuls+stats", models/unet.py): without
    # the tag the backward re-runs BOTH full-resolution reduction passes
    # per GN site, and XLA sinks the f32 convert of this function into the
    # producing conv's epilogue — materializing activation-size f32
    # copies/pads at every ds1/ds2 conv (r04 bwd HLO)
    return (checkpoint_name(mean, "gn_stats"),
            checkpoint_name(jax.lax.rsqrt(var + eps), "gn_stats"))


def _gn_expand(v: jnp.ndarray, c: int) -> jnp.ndarray:
    """(B, g, 1) group array -> (B, C) channel array (group-constant)."""
    b, g, _ = v.shape
    return jnp.broadcast_to(v, (b, g, c // g)).reshape(b, c)


def _gn_affine(x, a, bb):
    """One fused multiply-add pass y = x*A + B with (B, C) f32 coefficients
    consumed in ``x.dtype``: feeding an f32 cast of x to the elementwise
    pass makes XLA materialize the full-res f32 activation — profiled at
    ~3 ms/step of f32 copies/pads on the Case4 guided step."""
    b, c = x.shape[0], x.shape[-1]
    bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
    return x * a.reshape(bshape).astype(x.dtype) \
        + bb.reshape(bshape).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn_core(scale, bias, x, g, eps):
    mean, inv = _gn_moments(x, g, eps)
    c = x.shape[-1]
    a = _gn_expand(inv, c) * scale.astype(jnp.float32)
    bb = (bias.astype(jnp.float32)
          - _gn_expand(mean * inv, c) * scale.astype(jnp.float32))
    return _gn_affine(x, a, bb)


def _gn_fwd(scale, bias, x, g, eps):
    mean, inv = _gn_moments(x, g, eps)
    c = x.shape[-1]
    a = _gn_expand(inv, c) * scale.astype(jnp.float32)
    bb = (bias.astype(jnp.float32)
          - _gn_expand(mean * inv, c) * scale.astype(jnp.float32))
    return _gn_affine(x, a, bb), (scale, x, mean, inv)


def _gn_bwd(g, eps, res, dy):
    """Fused GroupNorm backward.

    Plain autodiff of the forward materializes full-resolution f32
    intermediates for the d var/dx path (profiled ~2 ms/step of f32
    pads/copies on the Case4 guided step).  The fused form needs only
    (a) two lane-preserving per-channel f32 reductions over (dy, dy*x) and
    (b) one elementwise pass  dx = dy*P + x*Q + R  with group-constant
    (B, C) f32 coefficients, consumed in the activation dtype — the exact
    mirror of the forward's y = x*A + B trick:
        dx_hat = dy*gamma;  xh = (x-mu)*inv
        dx = inv*(dx_hat - mean_g(dx_hat) - xh*mean_g(dx_hat*xh))
           = dy*(inv*gamma) + x*(-inv^2*m2) + (inv^2*mu*m2 - inv*m1)
        m1 = mean_g(dx_hat),  m2 = mean_g(dx_hat*xh)."""
    scale, x, mean, inv = res
    b, c = x.shape[0], x.shape[-1]
    n = int(np.prod(x.shape[1:-1])) * (c // g)
    red = tuple(range(1, x.ndim - 1))
    dyf = dy.astype(jnp.float32)
    r1 = jnp.sum(dyf, axis=red)                                 # (B, C)
    r2 = jnp.sum(dyf * x.astype(jnp.float32), axis=red)         # (B, C)
    gam = scale.astype(jnp.float32)                             # (C,)
    # per-group means of dx_hat and dx_hat*xh from the (B, C) reductions
    cg = c // g
    t1 = (gam[None] * r1).reshape(b, g, cg).sum(-1, keepdims=True)
    t2 = (gam[None] * (r2 - _gn_expand(mean, c) * r1)
          ).reshape(b, g, cg).sum(-1, keepdims=True)
    m1 = t1 / n                                                 # (B, g, 1)
    m2 = inv * t2 / n                                           # (B, g, 1)
    p = _gn_expand(inv, c) * gam[None]
    q = _gn_expand(-inv * inv * m2, c)
    r = _gn_expand(inv * inv * mean * m2 - inv * m1, c)
    bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
    dx = (dy * p.reshape(bshape).astype(dy.dtype)
          + x * q.reshape(bshape).astype(x.dtype)
          + r.reshape(bshape).astype(dy.dtype)).astype(x.dtype)
    # param grads from the same (B, C) reductions: dgamma = sum_b inv*(r2
    # - mu*r1), dbeta = sum_b r1 (tiny arrays, f32)
    dscale = (_gn_expand(inv, c) * (r2 - _gn_expand(mean, c) * r1)
              ).sum(0).astype(scale.dtype)
    dbias = r1.sum(0).astype(scale.dtype)
    return dscale, dbias, dx


_gn_core.defvjp(_gn_fwd, _gn_bwd)


def group_norm(params: dict, x: jnp.ndarray, num_groups: int = 32,
               eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over channels-last input, statistics in f32
    (``GroupNorm32``, reference ``src/nn.py:17-19``; torch GroupNorm eps
    default 1e-5).  Forward and backward are both single-reduction-pass +
    single-elementwise-pass formulations that never materialize an
    activation-sized f32 tensor (see ``_gn_moments``/``_gn_bwd``)."""
    c = x.shape[-1]
    g = min(num_groups, c)
    assert c % g == 0, f"channels {c} not divisible by groups {g}"
    return _gn_core(params["scale"], params["bias"], x, g, eps)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


# ---------------------------------------------------------------------------
# Fused GroupNorm(+FiLM)+SiLU
#
# The UNet's hot elementwise chain is norm -> (scale-shift) -> silu; run
# unfused it costs five-plus full-resolution memory passes per direction
# (profiled: GN 16.6% + SiLU 9.9% of the Case4 guided step).  The FiLM
# modulation folds into the normalizer's per-(B, C) affine coefficients
# (y = gn(x)*(1+s)+t is still y = x*A + B), so the whole chain is ONE
# elementwise pass over x in its own dtype, and the backward is two fused
# passes (one reduction pass for the per-channel sums, one dx pass), with
# the pre-activation z recomputed from x instead of materialized.
# ---------------------------------------------------------------------------

def _gn_film_coeffs(scale, bias, film_s, film_t, x, g, eps):
    """Per-(B, C) f32 affine coefficients of z = x*A + B for the
    normalized + FiLM-modulated pre-activation, plus the group moments."""
    mean, inv = _gn_moments(x, g, eps)
    c = x.shape[-1]
    gam = scale.astype(jnp.float32)[None] * (1.0 + film_s)       # (B, C)
    bet = bias.astype(jnp.float32)[None] * (1.0 + film_s) + film_t
    a = _gn_expand(inv, c) * gam
    b2 = bet - _gn_expand(mean * inv, c) * gam
    return a, b2, gam, mean, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gn_silu_core(scale, bias, film_s, film_t, x, g, eps):
    a, b2, _, _, _ = _gn_film_coeffs(scale, bias, film_s, film_t, x, g, eps)
    return jax.nn.silu(_gn_affine(x, a, b2))


def _gn_silu_fwd(scale, bias, film_s, film_t, x, g, eps):
    a, b2, _, mean, inv = _gn_film_coeffs(scale, bias, film_s, film_t,
                                          x, g, eps)
    # z is recomputed in the backward from x (one multiply-add), so only
    # the tiny moment arrays are carried as residuals beyond x itself
    return (jax.nn.silu(_gn_affine(x, a, b2)),
            (scale, bias, film_s, film_t, x, mean, inv))


def _gn_silu_bwd(g, eps, res, dy):
    """dz = dy * silu'(z) with z recomputed, then the fused-GN backward
    algebra of ``_gn_bwd`` with the per-(B, C) gain G = gamma*(1+s):
        dx = dz*P + x*Q + R,  P = inv*G,
        Q = -inv^2 * mean_g(dz_hat * xh),  R from the same group means,
    where the only full-resolution work is one reduction pass over
    (dz, dz*x) and one elementwise dx pass."""
    scale, bias, film_s, film_t, x, mean, inv = res
    b, c = x.shape[0], x.shape[-1]
    n = int(np.prod(x.shape[1:-1])) * (c // g)
    red = tuple(range(1, x.ndim - 1))
    bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
    gam = scale.astype(jnp.float32)[None] * (1.0 + film_s)       # (B, C)
    bet = bias.astype(jnp.float32)[None] * (1.0 + film_s) + film_t
    a = _gn_expand(inv, c) * gam
    b2 = bet - _gn_expand(mean * inv, c) * gam

    # dz = dy * silu'(x*A + B), computed ONCE in the activation dtype and
    # shared by the reductions and the dx pass.  Keeping every op that
    # touches dy in dy's own dtype is load-bearing for bf16: if the f32
    # convert directly consumes dy (as a per-consumer dz_of(f32) chain
    # did), XLA folds the convert into the upstream conv data-grad and
    # materializes every conv-bwd output as f32 — twice the HBM bytes on
    # the largest tensors in the backward (r04 HLO: f32[384,1,392,128]
    # buffers + f32 layout pads at every ds1/ds2 conv).  The f32 converts
    # below read the bf16 dz/x buffers inside the reduce fusions instead.
    z = (x * a.reshape(bshape).astype(x.dtype)
         + b2.reshape(bshape).astype(x.dtype))
    sig = jax.nn.sigmoid(z)
    dz = dy.astype(x.dtype) * (sig * (1.0 + z * (1.0 - sig)))

    # pass 1: per-channel f32 reductions (converts fuse into the reduce)
    dzf = dz.astype(jnp.float32)
    r1 = jnp.sum(dzf, axis=red)                                  # (B, C)
    r2 = jnp.sum(dzf * x.astype(jnp.float32), axis=red)          # (B, C)
    cg = c // g
    t1 = (gam * r1).reshape(b, g, cg).sum(-1, keepdims=True)
    t2 = (gam * (r2 - _gn_expand(mean, c) * r1)
          ).reshape(b, g, cg).sum(-1, keepdims=True)
    m1 = t1 / n                                                  # (B, g, 1)
    m2 = inv * t2 / n
    p = _gn_expand(inv, c) * gam
    q = _gn_expand(-inv * inv * m2, c)
    r = _gn_expand(inv * inv * mean * m2 - inv * m1, c)
    # pass 2: dx in the activation dtype, reusing the shared dz
    dx = (dz * p.reshape(bshape).astype(x.dtype)
          + x * q.reshape(bshape).astype(x.dtype)
          + r.reshape(bshape).astype(x.dtype)).astype(x.dtype)
    # parameter/FiLM grads from the same (B, C) reductions (tiny, f32)
    xhat_sum = _gn_expand(inv, c) * (r2 - _gn_expand(mean, c) * r1)
    dscale = ((1.0 + film_s) * xhat_sum).sum(0).astype(scale.dtype)
    dbias = ((1.0 + film_s) * r1).sum(0).astype(scale.dtype)
    dfilm_s = (scale.astype(jnp.float32)[None] * xhat_sum
               + bias.astype(jnp.float32)[None] * r1).astype(film_s.dtype)
    dfilm_t = r1.astype(film_t.dtype)
    return dscale, dbias, dfilm_s, dfilm_t, dx


_gn_silu_core.defvjp(_gn_silu_fwd, _gn_silu_bwd)


def group_norm_silu(params: dict, x: jnp.ndarray, num_groups: int = 32,
                    eps: float = 1e-5, film_scale=None,
                    film_shift=None) -> jnp.ndarray:
    """silu(group_norm(x) * (1 + film_scale) + film_shift) as one fused
    custom-VJP op (FiLM terms optional, (B, C) or broadcastable); exactly
    the reference ResBlock chain ``src/unet.py:233-241`` with the
    scale-shift-norm modulation folded into the normalizer affine."""
    b, c = x.shape[0], x.shape[-1]
    g = min(num_groups, c)
    assert c % g == 0, f"channels {c} not divisible by groups {g}"
    zeros = jnp.zeros((b, c), jnp.float32)
    fs = (zeros if film_scale is None
          else jnp.broadcast_to(film_scale.reshape(b, -1), (b, c))
          .astype(jnp.float32))
    ft = (zeros if film_shift is None
          else jnp.broadcast_to(film_shift.reshape(b, -1), (b, c))
          .astype(jnp.float32))
    if os.environ.get("CONFILD_GN_FUSED", "1") == "0":
        # debug/benchmark escape hatch: same math as one open XLA-autodiff
        # chain, to measure what the custom VJP buys (or costs)
        a, b2, *_ = _gn_film_coeffs(params["scale"], params["bias"], fs, ft,
                                    x, g, eps)
        return jax.nn.silu(_gn_affine(x, a, b2))
    return _gn_silu_core(params["scale"], params["bias"], fs, ft, x, g, eps)


def nearest_upsample(x: jnp.ndarray, dims: int) -> jnp.ndarray:
    """2x nearest-neighbor upsample over the inner-two spatial dims for 3-D
    and all spatial dims otherwise (reference ``src/unet.py:100-110``)."""
    if dims == 3:
        # (B, D, H, W, C): scale H and W only
        x = jnp.repeat(x, 2, axis=2)
        x = jnp.repeat(x, 2, axis=3)
        return x
    for ax in range(1, dims + 1):
        x = jnp.repeat(x, 2, axis=ax)
    return x


def update_ema(ema_params, new_params, rate: float = 0.9999):
    """EMA lerp: ema = rate * ema + (1-rate) * new (``src/nn.py:70-80``)."""
    return jax.tree.map(
        lambda e, p: e * rate + p.astype(e.dtype) * (1.0 - rate),
        ema_params, new_params)
