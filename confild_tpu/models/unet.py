"""ADM diffusion U-Net, TPU-native re-design of the reference
``UnconditionalDiffusionTraining_and_Generation/src/unet.py``.

Architecture parity (same block graph, same parameter shapes module-for-module
so torch checkpoints port):

* ``ResBlock`` with optional scale-shift GroupNorm FiLM, up/down variants
  (reference ``unet.py:143-256``),
* ``AttentionBlock`` with legacy or new head-split order and the
  ``1/sqrt(sqrt(d))`` two-sided scaling (``unet.py:259-393``),
* input/middle/output block stacks with skip concatenation and nearest
  up / strided-conv (or avg-pool) down sampling (``unet.py:396-663``).

TPU-native choices: channels-last layout end-to-end (XLA's native conv path;
the public ``apply`` accepts the reference's channels-first contract and
transposes at the boundary), f32 GroupNorm with an optional bf16 torso
(replacing the reference's fp16 machinery), attention in f32 softmax,
rematerialization via ``jax.checkpoint`` at block granularity instead of the
reference's custom autograd Function (``src/nn.py:138-184``).

The model is a pure function over an explicit param pytree; the static layer
graph is a "plan" of spec dataclasses built once per config.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from confild_tpu.models import nn as tnn

Params = Any


# ---------------------------------------------------------------------------
# layer specs (static plan nodes)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConvSpec:
    dims: int
    in_ch: int
    out_ch: int
    kernel: int = 3
    stride: int = 1
    zero: bool = False


@dataclasses.dataclass(frozen=True)
class ResSpec:
    dims: int
    in_ch: int
    out_ch: int
    emb_ch: int
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False
    dropout: float = 0.0


@dataclasses.dataclass(frozen=True)
class AttnSpec:
    ch: int
    num_heads: int
    new_order: bool = False
    use_flash: bool = False


@dataclasses.dataclass(frozen=True)
class UpSpec:
    dims: int
    in_ch: int
    out_ch: int
    use_conv: bool = True


@dataclasses.dataclass(frozen=True)
class DownSpec:
    dims: int
    in_ch: int
    out_ch: int
    use_conv: bool = True


# ---------------------------------------------------------------------------
# config + plan
# ---------------------------------------------------------------------------

def _save_matmuls(prim, *_, **__) -> bool:
    """Remat policy: save conv / dot outputs, recompute everything else.

    Block-granularity ``jax.checkpoint`` with the default (save-nothing)
    policy re-runs the block's convolutions in the backward — roughly one
    extra MXU forward per step (measured 0.84x single-stream on the
    ensemble bench).  Saving only matmul/conv outputs keeps HBM bounded by
    the conv activations (~1/3 of the no-remat residual set, which OOMs at
    ensemble x10: 18.8 G > 15.75 G) while restricting recompute to the
    cheap elementwise chains (GroupNorm/SiLU) between them."""
    return prim.name in ("conv_general_dilated", "dot_general")


def _save_matmuls_and_stats():
    """"matmuls" plus the GN moment arrays tagged ``gn_stats`` in
    ``models/nn.py::_gn_moments``.  The moments are (B, groups, 1) — a few
    hundred bytes — but carrying them across the remat boundary removes
    two full-resolution reduction passes per GN site from the backward
    AND the f32 conv-epilogue sink those recomputed reductions induce
    (activation-size f32 copies/pads at ds1/ds2 in the r04 bwd HLO)."""
    return jax.checkpoint_policies.save_from_both_policies(
        _save_matmuls,
        jax.checkpoint_policies.save_only_these_names("gn_stats"))


_REMAT_POLICIES = {"full": None, "matmuls": _save_matmuls,
                   "matmuls+stats": _save_matmuls_and_stats()}


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: tuple[int, ...]  # downsample factors (ds), not res
    dropout: float = 0.0
    channel_mult: tuple[float, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    dims: int = 2
    num_classes: int | None = None
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    torso_dtype: Any = jnp.float32     # set jnp.bfloat16 for a bf16 torso
    use_checkpoint: bool = False       # remat each top-level block
    remat_policy: str = "full"   # "full" | "matmuls" | "matmuls+stats"
    # (see _REMAT_POLICIES)
    use_flash_attention: bool = False  # Pallas blockwise attention (O(N) mem)
    flash_auto: bool = False           # gate flash per block by token count
    tail_dtype: Any = None             # dtype of the final norm+SiLU+conv;
    # None = torso dtype (perf default, ~6% of the Case4 guided step saved);
    # jnp.float32 = the reference's exact behavior (unet.py:662-663 casts h
    # to x.dtype BEFORE self.out, and convert_to_fp16 never touches self.out,
    # so the reference computes the final eps prediction in f32).  bf16-tail
    # output error is quantified in tests/test_unet.py::test_tail_dtype_error.

    @property
    def emb_ch(self) -> int:
        return self.model_channels * 4

    def heads_for(self, ch: int, upsample: bool = False) -> int:
        if self.num_head_channels != -1:
            assert ch % self.num_head_channels == 0
            return ch // self.num_head_channels
        if upsample and self.num_heads_upsample != -1:
            return self.num_heads_upsample
        return self.num_heads


@dataclasses.dataclass(frozen=True)
class UNetPlan:
    input_blocks: tuple[tuple[Any, ...], ...]
    middle_block: tuple[Any, ...]
    output_blocks: tuple[tuple[Any, ...], ...]
    out_ch_final: int


# token count at which the Pallas flash kernel's O(N) memory starts to
# matter: past it, the dense path's saved (BH, N, N) softmax weights (the
# VJP residual) reach GB scale per attention block and crowd out HBM.
# Below it dense XLA attention is both faster and small enough to keep:
# measured on v5e at 2304, 9216 (examples/xl_steady.json flash_vs_dense
# 0.98 — flash is a ~2% LOSS at 9216 tokens, its only value there being
# O(N) memory, and the (BH,N,N) residuals still fit at the xl width), so
# the crossover sits at the next exercised scale.  Re-measure with
# tools/xl_steady.py before lowering.
FLASH_MIN_TOKENS = 16384


def build_plan(cfg: UNetConfig) -> UNetPlan:
    """Mirror of the reference block construction (``unet.py:478-615``)."""
    mc, emb_ch = cfg.model_channels, cfg.emb_ch

    def flash_at(ds: int) -> bool:
        """Auto mode gates flash PER BLOCK: sub-threshold blocks in the same
        model stay on XLA attention, which is faster for them."""
        if not cfg.use_flash_attention:
            return False
        if not cfg.flash_auto:
            return True
        n = cfg.image_size // ds
        tokens = cfg.image_size * n * n if cfg.dims == 3 else n ** cfg.dims
        return tokens >= FLASH_MIN_TOKENS
    ch = input_ch = int(cfg.channel_mult[0] * mc)
    input_blocks: list[tuple[Any, ...]] = [
        (ConvSpec(cfg.dims, cfg.in_channels, ch),)
    ]
    input_block_chans = [ch]
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers: list[Any] = [ResSpec(
                cfg.dims, ch, int(mult * mc), emb_ch,
                cfg.use_scale_shift_norm, dropout=cfg.dropout)]
            ch = int(mult * mc)
            if ds in cfg.attention_resolutions:
                layers.append(AttnSpec(ch, cfg.heads_for(ch),
                                       cfg.use_new_attention_order,
                                       flash_at(ds)))
            input_blocks.append(tuple(layers))
            input_block_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                input_blocks.append((ResSpec(
                    cfg.dims, ch, ch, emb_ch, cfg.use_scale_shift_norm,
                    down=True, dropout=cfg.dropout),))
            else:
                input_blocks.append((DownSpec(cfg.dims, ch, ch,
                                              cfg.conv_resample),))
            input_block_chans.append(ch)
            ds *= 2

    middle_block = (
        ResSpec(cfg.dims, ch, ch, emb_ch, cfg.use_scale_shift_norm,
                dropout=cfg.dropout),
        AttnSpec(ch, cfg.heads_for(ch), cfg.use_new_attention_order,
                 flash_at(ds)),
        ResSpec(cfg.dims, ch, ch, emb_ch, cfg.use_scale_shift_norm,
                dropout=cfg.dropout),
    )

    output_blocks: list[tuple[Any, ...]] = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = input_block_chans.pop()
            layers = [ResSpec(
                cfg.dims, ch + ich, int(mc * mult), emb_ch,
                cfg.use_scale_shift_norm, dropout=cfg.dropout)]
            ch = int(mc * mult)
            if ds in cfg.attention_resolutions:
                layers.append(AttnSpec(ch, cfg.heads_for(ch, upsample=True),
                                       cfg.use_new_attention_order,
                                       flash_at(ds)))
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    layers.append(ResSpec(
                        cfg.dims, ch, ch, emb_ch, cfg.use_scale_shift_norm,
                        up=True, dropout=cfg.dropout))
                else:
                    layers.append(UpSpec(cfg.dims, ch, ch, cfg.conv_resample))
                ds //= 2
            output_blocks.append(tuple(layers))

    return UNetPlan(tuple(input_blocks), middle_block, tuple(output_blocks),
                    out_ch_final=input_ch)


# ---------------------------------------------------------------------------
# per-layer init/apply
# ---------------------------------------------------------------------------

def _init_layer(key, spec) -> Params:
    if isinstance(spec, ConvSpec):
        return {"conv": tnn.init_conv(key, spec.dims, spec.in_ch, spec.out_ch,
                                      spec.kernel, zero=spec.zero)}
    if isinstance(spec, ResSpec):
        k = jax.random.split(key, 4)
        p = {
            "in_norm": tnn.init_group_norm(spec.in_ch),
            "in_conv": tnn.init_conv(k[0], spec.dims, spec.in_ch, spec.out_ch),
            "emb": tnn.init_dense(
                k[1], spec.emb_ch,
                2 * spec.out_ch if spec.use_scale_shift_norm else spec.out_ch),
            "out_norm": tnn.init_group_norm(spec.out_ch),
            "out_conv": tnn.init_conv(k[2], spec.dims, spec.out_ch,
                                      spec.out_ch, zero=True),
        }
        if spec.out_ch != spec.in_ch:
            p["skip"] = tnn.init_conv(
                k[3], spec.dims, spec.in_ch, spec.out_ch,
                3 if spec.use_conv_skip else 1)
        return p
    if isinstance(spec, AttnSpec):
        k = jax.random.split(key, 2)
        return {
            "norm": tnn.init_group_norm(spec.ch),
            "qkv": tnn.init_conv(k[0], 1, spec.ch, spec.ch * 3, 1),
            "proj": tnn.init_conv(k[1], 1, spec.ch, spec.ch, 1, zero=True),
        }
    if isinstance(spec, UpSpec):
        if spec.use_conv:
            return {"conv": tnn.init_conv(key, spec.dims, spec.in_ch, spec.out_ch)}
        return {}
    if isinstance(spec, DownSpec):
        if spec.use_conv:
            return {"conv": tnn.init_conv(key, spec.dims, spec.in_ch, spec.out_ch)}
        return {}
    raise TypeError(spec)


def _resample(x, dims: int, up: bool):
    if up:
        return tnn.nearest_upsample(x, dims)
    window = (1, 2, 2) if dims == 3 else (2,) * dims
    return tnn.avg_pool(x, window)


def _apply_res(p: Params, spec: ResSpec, x, emb, *, dropout_rng=None):
    h = tnn.group_norm_silu(p["in_norm"], x)
    if spec.up or spec.down:
        h = _resample(h, spec.dims, spec.up)
        x = _resample(x, spec.dims, spec.up)
    h = tnn.conv(p["in_conv"], h)
    emb_out = tnn.dense(p["emb"], tnn.silu(emb)).astype(h.dtype)
    # broadcast emb over spatial dims: (B, C) -> (B, 1, ..., 1, C)
    emb_out = emb_out.reshape(emb_out.shape[0],
                              *(1,) * (h.ndim - 2), emb_out.shape[-1])
    if spec.use_scale_shift_norm:
        # the FiLM modulation folds into the fused norm's affine pass
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        h = tnn.group_norm_silu(p["out_norm"], h, film_scale=scale,
                                film_shift=shift)
    else:
        h = h + emb_out
        h = tnn.group_norm_silu(p["out_norm"], h)
    if spec.dropout > 0 and dropout_rng is not None:
        keep = 1.0 - spec.dropout
        mask = jax.random.bernoulli(dropout_rng, keep, h.shape)
        h = jnp.where(mask, h / keep, 0).astype(h.dtype)
    h = tnn.conv(p["out_conv"], h)
    skip = tnn.conv(p["skip"], x) if "skip" in p else x
    return skip + h


# token count at which sequence-parallel ring attention engages (below it,
# single-device attention — flash or dense — is faster than paying ring-hop
# latency; above it, O(N^2) attention memory outgrows one chip)
RING_MIN_TOKENS = 8192


def _apply_attn(p: Params, spec: AttnSpec, x, seq_mesh=None,
                ring_min_tokens: int = RING_MIN_TOKENS):
    b, *spatial, c = x.shape
    n = int(np.prod(spatial))
    h = x.reshape(b, n, c)
    h_norm = tnn.group_norm(p["norm"], h)
    qkv = tnn.conv(p["qkv"], h_norm)  # (B, N, 3C)
    heads, d = spec.num_heads, c // spec.num_heads
    if spec.new_order:
        # qkv channel layout: [q(all heads), k, v]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, heads, d)
        k = k.reshape(b, n, heads, d)
        v = v.reshape(b, n, heads, d)
    else:
        # legacy layout: per-head [q(d), k(d), v(d)] interleaved
        qkv = qkv.reshape(b, n, heads, 3 * d)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    n_ring = seq_mesh.devices.size if seq_mesh is not None else 0
    if n_ring > 1 and n >= ring_min_tokens and n % n_ring == 0:
        # sequence parallel: token axis sharded over the mesh, K/V shards
        # rotated over ICI (SURVEY §5.7 — latent images beyond one chip)
        from confild_tpu.ops.ring_attention import ring_attention
        qf = q.transpose(0, 2, 1, 3).reshape(b * heads, n, d)
        kf = k.transpose(0, 2, 1, 3).reshape(b * heads, n, d)
        vf = v.transpose(0, 2, 1, 3).reshape(b * heads, n, d)
        out = ring_attention(qf.astype(jnp.float32), kf.astype(jnp.float32),
                             vf.astype(jnp.float32), seq_mesh).astype(x.dtype)
        out = out.reshape(b, heads, n, d).transpose(0, 2, 1, 3)
    elif spec.use_flash:
        from confild_tpu.ops.flash_attention import flash_attention
        qf = q.transpose(0, 2, 1, 3).reshape(b * heads, n, d)
        kf = k.transpose(0, 2, 1, 3).reshape(b * heads, n, d)
        vf = v.transpose(0, 2, 1, 3).reshape(b * heads, n, d)
        out = flash_attention(qf, kf, vf)
        out = out.reshape(b, heads, n, d).transpose(0, 2, 1, 3)
    else:
        scale = 1.0 / np.sqrt(np.sqrt(d))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale,
                            preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(logits.astype(jnp.float32),
                                 axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    out = out.reshape(b, n, c)
    out = tnn.conv(p["proj"], out)
    return (h + out).reshape(b, *spatial, c)


def _apply_layer(p: Params, spec, x, emb, *, dropout_rng=None,
                 seq_mesh=None, ring_min_tokens: int = RING_MIN_TOKENS):
    if isinstance(spec, ConvSpec):
        return tnn.conv(p["conv"], x, stride=spec.stride)
    if isinstance(spec, ResSpec):
        return _apply_res(p, spec, x, emb, dropout_rng=dropout_rng)
    if isinstance(spec, AttnSpec):
        return _apply_attn(p, spec, x, seq_mesh=seq_mesh,
                           ring_min_tokens=ring_min_tokens)
    if isinstance(spec, UpSpec):
        x = tnn.nearest_upsample(x, spec.dims)
        return tnn.conv(p["conv"], x) if "conv" in p else x
    if isinstance(spec, DownSpec):
        if "conv" in p:
            stride = (1, 2, 2) if spec.dims == 3 else 2
            return tnn.conv(p["conv"], x, stride=stride, padding=1)
        return _resample(x, spec.dims, up=False)
    raise TypeError(spec)


# ---------------------------------------------------------------------------
# whole-model init / apply
# ---------------------------------------------------------------------------

class UNetModel:
    """Config + plan bundle with pure ``init`` / ``apply``.

    ``seq_mesh``: optional device mesh enabling sequence-parallel ring
    attention — attention blocks whose flattened token count reaches
    ``RING_MIN_TOKENS`` shard the token axis over the mesh and rotate K/V
    shards over ICI (``ops/ring_attention.py``).  Intended for latent images
    beyond single-chip attention memory; assumes the batch axis is NOT
    sharded over the same mesh axis."""

    def __init__(self, cfg: UNetConfig, seq_mesh=None,
                 ring_min_tokens: int = RING_MIN_TOKENS):
        self.cfg = cfg
        self.plan = build_plan(cfg)
        self.seq_mesh = seq_mesh
        self.ring_min_tokens = ring_min_tokens

    def init(self, key) -> Params:
        cfg, plan = self.cfg, self.plan
        n_blocks = (len(plan.input_blocks) + len(plan.middle_block)
                    + len(plan.output_blocks) + 4)
        keys = iter(jax.random.split(key, 200 + n_blocks * 8))

        params: dict[str, Any] = {
            "time_embed": [
                tnn.init_dense(next(keys), cfg.model_channels, cfg.emb_ch),
                tnn.init_dense(next(keys), cfg.emb_ch, cfg.emb_ch),
            ],
        }
        if cfg.num_classes is not None:
            params["label_emb"] = {
                "embedding": jax.random.normal(
                    next(keys), (cfg.num_classes, cfg.emb_ch)) }
        params["input_blocks"] = [
            [_init_layer(next(keys), spec) for spec in block]
            for block in plan.input_blocks
        ]
        params["middle_block"] = [
            _init_layer(next(keys), spec) for spec in plan.middle_block]
        params["output_blocks"] = [
            [_init_layer(next(keys), spec) for spec in block]
            for block in plan.output_blocks
        ]
        params["out_norm"] = tnn.init_group_norm(plan.out_ch_final)
        params["out_conv"] = tnn.init_conv(
            next(keys), cfg.dims, plan.out_ch_final, cfg.out_channels,
            zero=True)
        return params

    # conv/dense kernels that run on the (possibly bf16) torso activations;
    # "emb" stays f32 (the timestep embedding path runs in f32, its output
    # is cast to the torso dtype afterwards) and GroupNorm scale/bias stay
    # f32 (per-channel, negligible convert cost, used by the f32-statistics
    # custom-VJP kernel)
    _TORSO_KERNEL_KEYS = frozenset(
        {"in_conv", "out_conv", "skip", "qkv", "proj", "conv"})

    def cast_torso_params(self, params: Params) -> Params:
        """Pre-cast torso conv/dense kernels to ``cfg.torso_dtype``.

        ``apply`` casts every kernel to the activation dtype at use
        (``nn.py::dense/conv``); inside a long sampling ``lax.scan`` XLA
        does not hoist those weight converts out of the loop body, so a
        bf16-torso model pays an f32->bf16 convert of every weight on every
        denoise step.  Casting once up front makes the in-loop ``astype`` a
        no-op with bit-identical outputs (same rounding, applied earlier).
        Use for inference/sampling only — training keeps f32 master params.
        """
        dtype = self.cfg.torso_dtype
        if dtype == jnp.float32:
            return params

        def cast_layer(p: dict) -> dict:
            q = dict(p)
            for k in self._TORSO_KERNEL_KEYS & q.keys():
                q[k] = {n: v.astype(dtype) for n, v in q[k].items()}
            return q

        out = dict(params)
        out["input_blocks"] = [[cast_layer(p) for p in blk]
                               for blk in params["input_blocks"]]
        out["middle_block"] = [cast_layer(p)
                               for p in params["middle_block"]]
        out["output_blocks"] = [[cast_layer(p) for p in blk]
                                for blk in params["output_blocks"]]
        return out

    def apply(self, params: Params, x: jnp.ndarray, timesteps: jnp.ndarray,
              y: jnp.ndarray | None = None, *, channels_first: bool = True,
              dropout_rng=None) -> jnp.ndarray:
        """Forward pass.  ``x``: ``(B, C, *spatial)`` when ``channels_first``
        (the reference contract) else ``(B, *spatial, C)``."""
        cfg, plan = self.cfg, self.plan
        if channels_first:
            x = jnp.moveaxis(x, 1, -1)

        emb = tnn.dense(params["time_embed"][0],
                        tnn.timestep_embedding(timesteps, cfg.model_channels))
        emb = tnn.dense(params["time_embed"][1], tnn.silu(emb))
        if cfg.num_classes is not None:
            assert y is not None, "class-conditional model needs y"
            emb = emb + params["label_emb"]["embedding"][y]

        in_dtype = x.dtype
        h = x.astype(cfg.torso_dtype)

        seq_mesh, ring_min = self.seq_mesh, self.ring_min_tokens

        def run_block(block_params, block_specs, h, emb, rng):
            for i, (p, spec) in enumerate(zip(block_params, block_specs)):
                sub_rng = (jax.random.fold_in(rng, i)
                           if rng is not None else None)
                h = _apply_layer(p, spec, h, emb, dropout_rng=sub_rng,
                                 seq_mesh=seq_mesh, ring_min_tokens=ring_min)
            return h

        if cfg.use_checkpoint:
            maybe_ckpt = jax.checkpoint(
                run_block, static_argnums=(1,),
                policy=_REMAT_POLICIES[cfg.remat_policy])
        else:
            maybe_ckpt = run_block

        hs = []
        for bi, (bp, bs) in enumerate(zip(params["input_blocks"],
                                          plan.input_blocks)):
            rng = (jax.random.fold_in(dropout_rng, bi)
                   if dropout_rng is not None else None)
            h = maybe_ckpt(bp, bs, h, emb, rng)
            hs.append(h)

        rng = (jax.random.fold_in(dropout_rng, 1000)
               if dropout_rng is not None else None)
        h = maybe_ckpt(params["middle_block"], plan.middle_block, h, emb, rng)

        for bi, (bp, bs) in enumerate(zip(params["output_blocks"],
                                          plan.output_blocks)):
            rng = (jax.random.fold_in(dropout_rng, 2000 + bi)
                   if dropout_rng is not None else None)
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = maybe_ckpt(bp, bs, h, emb, rng)

        # Final norm+SiLU+conv dtype.  The reference computes this tail in
        # f32 (unet.py:662-663 casts h to x.dtype before self.out, and
        # convert_to_fp16 converts only the input/middle/output blocks) —
        # running it in the torso dtype is a DELIBERATE deviation worth ~6%
        # of the Case4 guided step (the 384^2x128 tail dominated otherwise).
        # cfg.tail_dtype=f32 restores reference-exact behavior; the bf16-tail
        # output error is quantified in tests/test_unet.py.
        tail_dtype = cfg.tail_dtype or cfg.torso_dtype
        h = h.astype(tail_dtype)
        h = tnn.group_norm_silu(params["out_norm"], h)
        h = tnn.conv(params["out_conv"], h)
        h = h.astype(in_dtype)
        if channels_first:
            h = jnp.moveaxis(h, -1, 1)
        return h

    def __call__(self, params, x, timesteps, y=None, **kw):
        return self.apply(params, x, timesteps, y, **kw)


# ---------------------------------------------------------------------------
# factory mirroring the reference create_model (script_util.py:130-187)
# ---------------------------------------------------------------------------

_DEFAULT_CHANNEL_MULT = {
    512: (0.5, 1, 1, 2, 2, 4, 4),
    256: (1, 1, 2, 2, 4, 4),
    128: (1, 1, 2, 3, 4),
    64: (1, 2, 3, 4),
}


def create_model(
    image_size: int,
    num_channels: int,
    num_res_blocks: int,
    dims: int = 2,
    out_channels: int = 1,
    channel_mult: str | Sequence[float] | None = None,
    learn_sigma: bool = False,
    class_cond: bool = False,
    num_classes: int = 1000,
    use_checkpoint: bool = False,
    remat_policy: str = "full",
    attention_resolutions: str = "16",
    num_heads: int = 1,
    num_head_channels: int = -1,
    num_heads_upsample: int = -1,
    use_scale_shift_norm: bool = False,
    dropout: float = 0.0,
    resblock_updown: bool = False,
    use_bf16: bool = False,
    use_fp16: bool = False,   # accepted for recipe compat; means bf16 on TPU
    use_new_attention_order: bool = False,
    use_flash_attention: bool | None = None,
    use_f32_tail: bool = False,
    sequence_parallel_mesh=None,
) -> UNetModel:
    if channel_mult is None:
        if image_size not in _DEFAULT_CHANNEL_MULT:
            raise ValueError(f"unsupported image size: {image_size}")
        channel_mult = _DEFAULT_CHANNEL_MULT[image_size]
    elif isinstance(channel_mult, str):
        channel_mult = tuple(int(m) for m in channel_mult.split(","))
    else:
        channel_mult = tuple(channel_mult)

    attention_ds = tuple(
        image_size // int(res) for res in str(attention_resolutions).split(","))

    flash_auto = use_flash_attention is None
    if flash_auto:
        # auto: the Pallas blockwise kernel's O(N) memory (no (BH, N, N)
        # VJP residual) is what enables latent images beyond the
        # reference's 384^2; below FLASH_MIN_TOKENS dense XLA attention is
        # faster and small enough to keep. build_plan applies the
        # threshold PER BLOCK; this flag records whether any block
        # crosses it.
        def _tokens(ds):
            n = image_size // ds
            return image_size * n * n if dims == 3 else n ** dims
        use_flash_attention = max(
            _tokens(ds) for ds in attention_ds) >= FLASH_MIN_TOKENS

    cfg = UNetConfig(
        image_size=image_size,
        in_channels=out_channels,
        model_channels=num_channels,
        out_channels=out_channels if not learn_sigma else 2 * out_channels,
        num_res_blocks=num_res_blocks,
        attention_resolutions=attention_ds,
        dropout=dropout,
        channel_mult=channel_mult,
        dims=dims,
        num_classes=num_classes if class_cond else None,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        use_new_attention_order=use_new_attention_order,
        torso_dtype=jnp.bfloat16 if (use_bf16 or use_fp16) else jnp.float32,
        use_checkpoint=use_checkpoint,
        remat_policy=remat_policy,
        use_flash_attention=bool(use_flash_attention),
        flash_auto=flash_auto,
        # reference-exact numerics knob (unet.py:734-735 computes the final
        # eps head in f32 even under convert_to_fp16); recipes set
        # use_f32_tail: true to restore it on a bf16 torso
        tail_dtype=jnp.float32 if use_f32_tail else None,
    )
    return UNetModel(cfg, seq_mesh=sequence_parallel_mesh)
