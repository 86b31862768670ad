"""Fused Pallas TPU kernel for the SIREN-FiLM decode — the hottest op in both
CNF training and DPS guidance (reference call stacks: CNF hot loop
``ConditionalNeuralField/scripts/train.py:404-417``; DPS decode
``ConditionalDiffusionGeneration/.../measurements.py:219-226``).

Why a kernel: the decode is a stack of ``x = sin(w0*(x @ W1_l + z_l))`` layers
over ``T x M`` (latent-rows x mesh-points) activations.  Layer-by-layer XLA
execution writes the ``(T*M, H)`` activation to HBM at every layer boundary;
this kernel keeps the activation tile resident in VMEM for the entire layer
stack and streams only the ``(H, H)`` weights, so HBM traffic drops from
``O(n_layers * T * M * H)`` to ``O(T*M*(C_in+C_out)) + O(tiles * weights)``.

Structure:

* the FiLM projections ``z_l = latents @ W2_l + b1_l`` depend only on
  ``(t, layer)`` — computed once in XLA (negligible FLOPs) and passed in as a
  ``(n_layers, T, H)`` table.
* grid = (T_tiles, M_tiles, n_layers+1), layers innermost; the activation
  lives in a VMEM scratch ``(TT*TM, H)``; the per-layer hidden weight block is
  auto-pipelined (double-buffered) by Pallas.
* first layer consumes the coordinate tile; last grid step applies the linear
  head and writes the ``(TT, TM, C_out)`` output block.

Gradients: ``fused_siren_decode`` carries a ``jax.custom_vjp`` whose backward
rematerializes through the pure-jnp reference forward
(:func:`confild_tpu.models.cnf.siren_film_apply`), so it is differentiable
wrt params *and* latents (DPS differentiates wrt latents only; XLA dead-code
eliminates the unused param cotangents).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from confild_tpu.models.cnf import siren_film_apply

DEFAULT_TILE_T = 8
DEFAULT_TILE_M = 256

# Minimax odd-polynomial coefficients for sin(2*pi*r) on r in [-0.5, 0.5]
# (max abs error 9.6e-8 < f32 ulp at unit scale).  The SIREN activation
# sin(w0 * x) is evaluated as sin2pi(r) with the w0/(2*pi) scale folded into
# the weights upstream, so the kernel pays only round-reduce + 5 FMAs instead
# of a ~20-op libm range-reduction sine — the VPU, not the MXU, is the
# bottleneck of this kernel.
_SIN2PI_COEFFS = (
    6.283182820587522,
    -41.341421583622676,
    81.59618849495108,
    -76.58014706347774,
    41.20559778878122,
    -12.271581478633225,
)


def _sin2pi(r):
    """sin(2*pi*r) for any r, via r -= round(r) reduction + odd minimax poly."""
    r = r - jnp.round(r)
    r2 = r * r
    p = jnp.float32(_SIN2PI_COEFFS[-1])
    for c in _SIN2PI_COEFFS[-2::-1]:
        p = p * r2 + jnp.float32(c)
    return r * p


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _stack_params(params) -> tuple:
    """Split the param pytree into kernel operands.

    Returns (w_first (C_in,H), w_mid (n_mid,H,H), w_head (H,C_out),
    b_head (1,C_out), w2 (n_mod,L,H), b1 (n_mod,H))."""
    net1, net2 = params["net1"], params["net2"]
    n_mod = len(net2)
    w_first = net1[0]["kernel"]
    w_mid = (jnp.stack([net1[i]["kernel"] for i in range(1, n_mod)])
             if n_mod > 1 else
             jnp.zeros((1,) + net1[0]["kernel"].shape[-1:] * 2,
                       net1[0]["kernel"].dtype))
    w_head = net1[-1]["kernel"]
    b_head = net1[-1].get("bias")
    w2 = jnp.stack([net2[i]["kernel"] for i in range(n_mod)])
    b1 = jnp.stack([net1[i].get("bias", jnp.zeros(net1[i]["kernel"].shape[-1]))
                    for i in range(n_mod)])
    return w_first, w_mid, w_head, b_head, w2, b1


def _decode_kernel(coords_ref, z_ref, w_first_ref, w_mid_ref, w_head_ref,
                   b_head_ref, out_ref, x_scratch, *, n_layers: int,
                   tile_t: int, tile_m: int, compute_dtype):
    """One grid step = one layer of the modulated MLP on a (TT, TM) tile.

    Weights and FiLM rows arrive pre-scaled by w0/(2*pi): the pre-activation
    is already "in turns", so the activation is `_sin2pi`.
    """
    l = pl.program_id(2)
    h = x_scratch.shape[-1]

    z = z_ref[0]  # (TT, H) FiLM row block for this layer/t-tile

    def mxu(a, b):
        return jnp.dot(a.astype(compute_dtype), b.astype(compute_dtype),
                       preferred_element_type=jnp.float32)

    @pl.when(l == 0)
    def _first():
        pre = mxu(coords_ref[...], w_first_ref[...])  # (TM, H)
        # broadcast over the latent tile: (TT, TM, H) -> flat (TT*TM, H)
        act = _sin2pi(pre[None, :, :] + z[:, None, :])
        x_scratch[...] = act.reshape(tile_t * tile_m, h)

    @pl.when(jnp.logical_and(l > 0, l < n_layers))
    def _mid():
        pre = mxu(x_scratch[...], w_mid_ref[0])
        pre = pre.reshape(tile_t, tile_m, h) + z[:, None, :]
        x_scratch[...] = _sin2pi(pre).reshape(tile_t * tile_m, h)

    @pl.when(l == n_layers)
    def _head():
        out = mxu(x_scratch[...], w_head_ref[...])
        out = out + b_head_ref[...]
        out_ref[...] = out.reshape(tile_t, tile_m, out.shape[-1])


def _pad_to(x, axis: int, multiple: int):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("w0", "tile_t", "tile_m", "interpret", "compute_dtype"))
def _fused_forward(params, coords, latents, w0: float,
                   tile_t: int, tile_m: int, interpret: bool, compute_dtype):
    w_first, w_mid, w_head, b_head, w2, b1 = _stack_params(params)
    n_mod = w2.shape[0]
    h = w_first.shape[-1]
    c_out = w_head.shape[-1]
    t, m = latents.shape[0], coords.shape[0]

    # FiLM projections for every (layer, latent row): (n_mod, T, H)
    z = jnp.einsum("tl,nlh->nth", latents, w2,
                   preferred_element_type=jnp.float32) + b1[:, None, :]

    # Fold the sine frequency into the modulated-layer weights so the kernel's
    # pre-activations are in "turns" and the activation is a cheap sin2pi.
    scale = jnp.float32(w0 / (2.0 * np.pi))
    w_first = w_first * scale
    w_mid = w_mid * scale
    z = z * scale

    # Mosaic requires sublane block dims divisible by 8 unless the block spans
    # the whole axis: round tile_t up when it would tile a larger T.
    if tile_t % 8 != 0 and t > tile_t:
        tile_t = -(-tile_t // 8) * 8

    coords_p = _pad_to(coords, 0, tile_m)
    z_p = _pad_to(z, 1, tile_t)
    tp, mp = z_p.shape[1], coords_p.shape[0]
    if b_head is None:
        b_head = jnp.zeros((c_out,), w_head.dtype)

    grid = (tp // tile_t, mp // tile_m, n_mod + 1)
    n_mid = w_mid.shape[0]

    out = pl.pallas_call(
        functools.partial(_decode_kernel, n_layers=n_mod,
                          tile_t=tile_t, tile_m=tile_m,
                          compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, coords.shape[-1]),
                         lambda ti, mi, li: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, h),
                         lambda ti, mi, li: (jnp.minimum(li, n_mod - 1), ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((coords.shape[-1], h),
                         lambda ti, mi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, h),
                         lambda ti, mi, li: (jnp.clip(li - 1, 0, n_mid - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c_out),
                         lambda ti, mi, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out),
                         lambda ti, mi, li: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, tile_m, c_out),
                               lambda ti, mi, li: (ti, mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, mp, c_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_t * tile_m, h), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * mp * h * (h * n_mod + coords.shape[-1] + c_out),
            bytes_accessed=tp * mp * (coords.shape[-1] + c_out) * 4
            + (tp // tile_t) * (mp // tile_m) * (n_mod * h * h) * 4,
            transcendentals=tp * mp * h * n_mod,
        ),
    )(coords_p, z_p, w_first, w_mid, w_head, b_head[None, :])
    return out[:t, :m]


def _reference_decode(params, coords, latents, w0):
    """(T, L) x (M, C) -> (T, M, C_out) via the pure-jnp apply."""
    return siren_film_apply(params, coords[None, :, :], latents[:, None, :], w0=w0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_siren_decode(params, coords, latents, w0: float = 30.0,
                       tile_t: int = DEFAULT_TILE_T,
                       tile_m: int = DEFAULT_TILE_M,
                       interpret: bool | None = None,
                       compute_dtype=jnp.float32):
    """Decode every latent row at every coordinate: ``(T, M, C_out)``.

    ``coords``: ``(M, C_in)`` query points, ``latents``: ``(T, L)`` latent
    rows.  Forward runs the fused Pallas kernel on TPU (interpreter elsewhere);
    backward rematerializes through the jnp reference path.
    """
    if interpret is None:
        interpret = _interpret_default()
    return _fused_forward(params, coords, latents, w0, tile_t, tile_m, interpret,
                          compute_dtype)


def _fwd(params, coords, latents, w0, tile_t, tile_m, interpret, compute_dtype):
    out = fused_siren_decode(params, coords, latents, w0, tile_t, tile_m,
                             interpret, compute_dtype)
    return out, (params, coords, latents)


# Coordinate-axis chunk size for the rematerialized backward.  Param/latent
# cotangents sum over mesh points, so the VJP runs independently per chunk —
# bounding activation memory at ~n_layers * T * BWD_CHUNK * H floats instead
# of the full-mesh O(53 GB) a naive vjp would store at case2 scale.
BWD_CHUNK = 4096


def _dcoords_chunked(params, coords, latents, g, w0):
    """dL/dcoords via chunked jnp rematerialization.  Kept separate so XLA
    dead-code-eliminates it when the caller never consumes dcoords (true in
    CNF training and DPS — nothing differentiates query points)."""
    m = coords.shape[0]

    def ref(c_chunk):
        return _reference_decode(params, c_chunk, latents, w0)

    if m <= BWD_CHUNK:
        _, vjp = jax.vjp(ref, coords)
        return vjp(g)[0]

    coords_p = _pad_to(coords, 0, BWD_CHUNK)
    g_p = _pad_to(g, 1, BWD_CHUNK)  # padded g rows are zero -> no grad leak
    n_chunks = coords_p.shape[0] // BWD_CHUNK
    c_chunks = coords_p.reshape(n_chunks, BWD_CHUNK, coords.shape[-1])
    g_chunks = jnp.moveaxis(
        g_p.reshape(g.shape[0], n_chunks, BWD_CHUNK, g.shape[-1]), 1, 0)

    def body(_, inp):
        c_chunk, g_chunk = inp
        _, vjp = jax.vjp(ref, c_chunk)
        return None, vjp(g_chunk)[0]

    _, dcs = jax.lax.scan(body, None, (c_chunks, g_chunks))
    return dcs.reshape(-1, coords.shape[-1])[:m]


def _bwd(w0, tile_t, tile_m, interpret, compute_dtype, residuals, g):
    params, coords, latents = residuals
    # dparams + dlatents: one fused Pallas pass (activation recompute stays
    # in VMEM, see fused_siren_decode_bwd below)
    dp, dz = fused_siren_decode_bwd(params, coords, latents, g, w0,
                                    interpret=interpret)
    dcoords = _dcoords_chunked(params, coords, latents, g, w0)
    return dp, dcoords, dz


fused_siren_decode.defvjp(_fwd, _bwd)


def siren_decode(params, coords, latents, w0: float = 30.0,
                 use_pallas: bool = True, **tile_kwargs):
    """Dispatch between the fused kernel and the jnp reference path."""
    if use_pallas:
        return fused_siren_decode(params, coords, latents, w0, **tile_kwargs)
    return _reference_decode(params, coords, latents, w0)


# ---------------------------------------------------------------------------
# fused backward (dZ): the DPS-critical cotangent
# ---------------------------------------------------------------------------

def _cos2pi_scaled(r):
    """d sin2pi(r) / dr = 2*pi*cos(2*pi*r), evaluated with the same fast
    minimax polynomial via the quarter-turn identity cos(2*pi*r) =
    sin(2*pi*(r + 1/4)) — a libm cosine here would dominate the backward
    kernel's runtime."""
    return (2.0 * np.pi) * _sin2pi(r + 0.25)


def _decode_dz_kernel(coords_ref, z_ref, g_ref, w_first_ref, w_mid_ref,
                      w_head_ref, dz_ref, acts_ref, dx_ref, *,
                      n_layers: int, tile_t: int, tile_m: int):
    """Grid (T_tiles, M_tiles): recompute the forward storing pre-activations
    ("in turns") in VMEM, then walk backward producing the dZ block for this
    t-tile, accumulated across m-tiles (sequential grid => safe revisiting).

    Refs:
      coords (TM, C), z (n_mod, TT, H) scaled FiLM rows, g (TT, TM, C_out)
      w_first (C, H) scaled, w_mid (n_mid, H, H) scaled, w_head (H, C_out)
      dz out (n_mod, TT, H); scratch acts (n_mod, TT*TM, H) pre-activations,
      dx (TT*TM, H).
    """
    mi = pl.program_id(1)
    h = acts_ref.shape[-1]
    flat = tile_t * tile_m

    @pl.when(mi == 0)
    def _init():
        dz_ref[...] = jnp.zeros_like(dz_ref)

    # ---- forward recompute, storing pre-activations r_l ----
    pre = jnp.dot(coords_ref[...], w_first_ref[...],
                  preferred_element_type=jnp.float32)
    r = pre[None, :, :] + z_ref[0][:, None, :]          # (TT, TM, H)
    acts_ref[0] = r.reshape(flat, h)
    x = _sin2pi(r).reshape(flat, h)
    for l in range(1, n_layers):
        pre = jnp.dot(x, w_mid_ref[l - 1], preferred_element_type=jnp.float32)
        r = pre.reshape(tile_t, tile_m, h) + z_ref[l][:, None, :]
        acts_ref[l] = r.reshape(flat, h)
        x = _sin2pi(r).reshape(flat, h)

    # ---- backward ----
    g = g_ref[...].reshape(flat, g_ref.shape[-1])
    dx_ref[...] = jnp.dot(g, w_head_ref[...].T,
                          preferred_element_type=jnp.float32)
    for l in range(n_layers - 1, -1, -1):
        dpre = dx_ref[...] * _cos2pi_scaled(acts_ref[l])      # (flat, H)
        dz_ref[l] += dpre.reshape(tile_t, tile_m, h).sum(axis=1)
        if l > 0:
            dx_ref[...] = jnp.dot(dpre, w_mid_ref[l - 1].T,
                                  preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("w0", "tile_t", "tile_m", "interpret"))
def fused_siren_decode_dz(params, coords, latents, g, w0: float = 30.0,
                          tile_t: int = 8, tile_m: int = 128,
                          interpret: bool | None = None):
    """dL/dlatents for ``fused_siren_decode`` outputs, fully fused: one Pallas
    pass recomputes activations tile-wise in VMEM and runs the backward chain,
    so no (T*M*H)-sized activation ever touches HBM (the jnp vjp would store
    ``n_layers`` of them — 53 GB at case2 scale)."""
    if interpret is None:
        interpret = _interpret_default()
    w_first, w_mid, w_head, b_head, w2, b1 = _stack_params(params)
    n_mod = w2.shape[0]
    h = w_first.shape[-1]
    c_out = w_head.shape[-1]
    t, m = latents.shape[0], coords.shape[0]

    scale = jnp.float32(w0 / (2.0 * np.pi))
    z = (jnp.einsum("tl,nlh->nth", latents, w2,
                    preferred_element_type=jnp.float32)
         + b1[:, None, :]) * scale
    w_first_s = w_first * scale
    w_mid_s = w_mid * scale

    if tile_t % 8 != 0 and t > tile_t:
        tile_t = -(-tile_t // 8) * 8
    coords_p = _pad_to(coords, 0, tile_m)
    z_p = _pad_to(z, 1, tile_t)
    g_p = _pad_to(_pad_to(g, 0, tile_t), 1, tile_m)
    tp, mp = z_p.shape[1], coords_p.shape[0]
    n_mid = w_mid.shape[0]

    grid = (tp // tile_t, mp // tile_m)
    dz_scaled = pl.pallas_call(
        functools.partial(_decode_dz_kernel, n_layers=n_mod,
                          tile_t=tile_t, tile_m=tile_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, coords.shape[-1]),
                         lambda ti, mi: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mod, tile_t, h),
                         lambda ti, mi: (0, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, tile_m, c_out),
                         lambda ti, mi: (ti, mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((coords.shape[-1], h),
                         lambda ti, mi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((max(n_mid, 1), h, h),
                         lambda ti, mi: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c_out),
                         lambda ti, mi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_mod, tile_t, h),
                               lambda ti, mi: (0, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_mod, tp, h), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_mod, tile_t * tile_m, h), jnp.float32),
            pltpu.VMEM((tile_t * tile_m, h), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(coords_p, z_p, g_p, w_first_s, w_mid_s, w_head)

    # chain through the (scaled) FiLM table back to the latents
    dz = dz_scaled[:, :t, :] * scale
    return jnp.einsum("nth,nlh->tl", dz, w2,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# full fused backward (dW + db + dZ): the CNF-training cotangents
# ---------------------------------------------------------------------------

def _decode_bwd_kernel(coords_ref, z_ref, g_ref, w_first_ref, w_mid_ref,
                       w_head_ref, dz_ref, dwf_ref, dwm_ref, dwh_ref,
                       acts_ref, dx_ref, *, n_layers: int, tile_t: int,
                       tile_m: int):
    """Grid (T_tiles, M_tiles): recompute pre-activations in VMEM, then walk
    backward producing per-layer weight-gradient blocks accumulated across the
    whole grid (constant output index => the accumulators never leave VMEM)
    plus the dZ block per t-tile.  Backward cost ~2x forward FLOPs (one extra
    x^T.dpre matmul per layer), all on the MXU."""
    ti = pl.program_id(0)
    mi = pl.program_id(1)
    h = acts_ref.shape[-1]
    flat = tile_t * tile_m

    @pl.when(mi == 0)
    def _init_dz():
        dz_ref[...] = jnp.zeros_like(dz_ref)

    @pl.when(jnp.logical_and(ti == 0, mi == 0))
    def _init_dw():
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
        dwm_ref[...] = jnp.zeros_like(dwm_ref)
        dwh_ref[...] = jnp.zeros_like(dwh_ref)

    def mxu(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    # ---- forward recompute, storing pre-activations r_l ("in turns") ----
    pre = mxu(coords_ref[...], w_first_ref[...])
    r = pre[None, :, :] + z_ref[0][:, None, :]            # (TT, TM, H)
    acts_ref[0] = r.reshape(flat, h)
    x = _sin2pi(r).reshape(flat, h)
    for l in range(1, n_layers):
        pre = mxu(x, w_mid_ref[l - 1])
        r = pre.reshape(tile_t, tile_m, h) + z_ref[l][:, None, :]
        acts_ref[l] = r.reshape(flat, h)
        x = _sin2pi(r).reshape(flat, h)

    # ---- backward ----
    g = g_ref[...].reshape(flat, g_ref.shape[-1])
    dwh_ref[...] += mxu(x.T, g)
    dx_ref[...] = mxu(g, w_head_ref[...].T)
    for l in range(n_layers - 1, -1, -1):
        dpre = dx_ref[...] * _cos2pi_scaled(acts_ref[l])  # (flat, H)
        dz_ref[l] += dpre.reshape(tile_t, tile_m, h).sum(axis=1)
        if l > 0:
            x_prev = _sin2pi(acts_ref[l - 1])
            dwm_ref[l - 1] += mxu(x_prev.T, dpre)
            dx_ref[...] = mxu(dpre, w_mid_ref[l - 1].T)
        else:
            # sum dpre over the latent tile, then one (C, TM)x(TM, H) matmul
            dpre_m = dpre.reshape(tile_t, tile_m, h).sum(axis=0)
            dwf_ref[...] += mxu(coords_ref[...].T, dpre_m)


@functools.partial(jax.jit,
                   static_argnames=("w0", "tile_t", "tile_m", "interpret"))
def fused_siren_decode_bwd(params, coords, latents, g, w0: float = 30.0,
                           tile_t: int = 8, tile_m: int = 128,
                           interpret: bool | None = None):
    """All training cotangents of ``fused_siren_decode`` in one fused Pallas
    pass: returns ``(dparams, dlatents)``.  Like the dZ kernel, activations
    are recomputed tile-wise in VMEM, so no (T*M*H) tensor touches HBM; the
    weight-gradient accumulators live in VMEM for the whole kernel."""
    if interpret is None:
        interpret = _interpret_default()
    w_first, w_mid, w_head, b_head, w2, b1 = _stack_params(params)
    n_mod = w2.shape[0]
    h = w_first.shape[-1]
    c_in = coords.shape[-1]
    c_out = w_head.shape[-1]
    t, m = latents.shape[0], coords.shape[0]

    scale = jnp.float32(w0 / (2.0 * np.pi))
    z = (jnp.einsum("tl,nlh->nth", latents, w2,
                    preferred_element_type=jnp.float32)
         + b1[:, None, :]) * scale
    w_first_s = w_first * scale
    w_mid_s = w_mid * scale

    if tile_t % 8 != 0 and t > tile_t:
        tile_t = -(-tile_t // 8) * 8
    coords_p = _pad_to(coords, 0, tile_m)
    z_p = _pad_to(z, 1, tile_t)
    g_p = _pad_to(_pad_to(g, 0, tile_t), 1, tile_m)
    tp, mp = z_p.shape[1], coords_p.shape[0]
    n_mid = w_mid.shape[0]

    grid = (tp // tile_t, mp // tile_m)
    dz_scaled, dwf, dwm, dwh = pl.pallas_call(
        functools.partial(_decode_bwd_kernel, n_layers=n_mod,
                          tile_t=tile_t, tile_m=tile_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, c_in),
                         lambda ti, mi: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mod, tile_t, h),
                         lambda ti, mi: (0, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, tile_m, c_out),
                         lambda ti, mi: (ti, mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, h),
                         lambda ti, mi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((max(n_mid, 1), h, h),
                         lambda ti, mi: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c_out),
                         lambda ti, mi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_mod, tile_t, h),
                         lambda ti, mi: (0, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, h),
                         lambda ti, mi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((max(n_mid, 1), h, h),
                         lambda ti, mi: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c_out),
                         lambda ti, mi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_mod, tp, h), jnp.float32),
            jax.ShapeDtypeStruct((c_in, h), jnp.float32),
            jax.ShapeDtypeStruct((max(n_mid, 1), h, h), jnp.float32),
            jax.ShapeDtypeStruct((h, c_out), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_mod, tile_t * tile_m, h), jnp.float32),
            pltpu.VMEM((tile_t * tile_m, h), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * tp * mp * h * (h * n_mod + c_in + c_out),
            bytes_accessed=tp * mp * (c_in + 2 * c_out) * 4
            + (tp // tile_t) * (mp // tile_m) * (2 * n_mod * h * h) * 4,
            transcendentals=2 * tp * mp * h * n_mod,
        ),
    )(coords_p, z_p, g_p, w_first_s, w_mid_s, w_head)

    # unscale and slice away t padding
    dz = dz_scaled[:, :t, :] * scale            # (n_mod, T, H), d/d(z_l)
    dwf = dwf * scale
    dwm = dwm * scale

    # chain through the FiLM projections z_l = latents @ W2_l + b1_l
    dlatents = jnp.einsum("nth,nlh->tl", dz, w2,
                          preferred_element_type=jnp.float32)
    dw2 = jnp.einsum("tl,nth->nlh", latents, dz,
                     preferred_element_type=jnp.float32)
    db1 = dz.sum(axis=1)                        # (n_mod, H)

    # assemble a cotangent pytree mirroring the param structure
    dnet1 = []
    for l in range(n_mod):
        d = {"kernel": dwf if l == 0 else dwm[l - 1]}
        if "bias" in params["net1"][l]:
            d["bias"] = db1[l]
        dnet1.append(d)
    head = {"kernel": dwh}
    if "bias" in params["net1"][-1]:
        head["bias"] = g.sum(axis=(0, 1))
    dnet1.append(head)
    dnet2 = []
    for l in range(n_mod):
        d = {"kernel": dw2[l]}
        if "bias" in params["net2"][l]:
            # the fused forward treats net2 as bias-free (reference film
            # semantics); a structural bias leaf gets a zero cotangent
            d["bias"] = jnp.zeros_like(params["net2"][l]["bias"])
        dnet2.append(d)
    dp = {"net1": dnet1, "net2": dnet2}
    # match the container types of the param pytree (list vs tuple matters
    # for custom_vjp cotangent structure)
    dp["net1"] = type(params["net1"])(dnet1)
    dp["net2"] = type(params["net2"])(dnet2)
    return dp, dlatents


# ---------------------------------------------------------------------------
# training variant: params + latents differentiable, coords are frozen query
# points.  The general op's dcoords chunked-remat scan is NOT reliably
# dead-code-eliminated by XLA (DCE does not cross lax.scan), so the trainer
# calls this op where the coords cotangent is structurally zero.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_siren_decode_train(params, coords, latents, w0: float = 30.0,
                             tile_t: int = DEFAULT_TILE_T,
                             tile_m: int = DEFAULT_TILE_M,
                             interpret: bool | None = None,
                             compute_dtype=jnp.float32):
    if interpret is None:
        interpret = _interpret_default()
    return _fused_forward(params, coords, latents, w0, tile_t, tile_m,
                          interpret, compute_dtype)


def _train_fwd(params, coords, latents, w0, tile_t, tile_m, interpret,
               compute_dtype):
    out = fused_siren_decode_train(params, coords, latents, w0, tile_t,
                                   tile_m, interpret, compute_dtype)
    return out, (params, coords, latents)


def _train_bwd(w0, tile_t, tile_m, interpret, compute_dtype, residuals, g):
    params, coords, latents = residuals
    dp, dz = fused_siren_decode_bwd(params, coords, latents, g, w0,
                                    interpret=interpret)
    return dp, jnp.zeros_like(coords), dz


fused_siren_decode_train.defvjp(_train_fwd, _train_bwd)


# ---------------------------------------------------------------------------
# frozen-decoder variant: only latents are differentiable (the DPS contract —
# the CNF decoder is frozen during guided sampling, reference
# measurements.py:76-78 model.eval()); backward is ONLY the fused dZ kernel.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_siren_decode_frozen(params, coords, latents, w0: float = 30.0,
                              tile_t: int = DEFAULT_TILE_T,
                              tile_m: int = DEFAULT_TILE_M,
                              interpret: bool | None = None,
                              compute_dtype=jnp.float32):
    if interpret is None:
        interpret = _interpret_default()
    return _fused_forward(params, coords, latents, w0, tile_t, tile_m,
                          interpret, compute_dtype)


def _frozen_fwd(params, coords, latents, w0, tile_t, tile_m, interpret,
                compute_dtype):
    out = fused_siren_decode_frozen(params, coords, latents, w0, tile_t,
                                    tile_m, interpret, compute_dtype)
    return out, (params, coords, latents)


def _frozen_bwd(w0, tile_t, tile_m, interpret, compute_dtype, residuals, g):
    params, coords, latents = residuals
    dz = fused_siren_decode_dz(params, coords, latents, g, w0,
                               interpret=interpret)
    # frozen decoder/mesh: zero cotangents (folded away by XLA)
    return (jax.tree.map(jnp.zeros_like, params),
            jnp.zeros_like(coords), dz)


fused_siren_decode_frozen.defvjp(_frozen_fwd, _frozen_bwd)
