"""UNet family extras: super-resolution conditioning and the encoder half
(classifier) — reference ``src/unet.py:666-894``.

* :class:`SuperResModel` doubles the input channels and concatenates a
  bilinear-upsampled low-resolution conditioning image (``unet.py:666-681``).
* :class:`EncoderUNetModel` is the encoder torso + pooling head used as the
  classifier for classifier guidance (``unet.py:683-894``); pools:
  ``adaptive`` (global avg + 1x1 zero conv), ``attention`` (attention pool),
  ``spatial``/``spatial_v2`` (MLP over concatenated per-stage means).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from confild_tpu.models import nn as tnn
from confild_tpu.models.unet import (UNetConfig, UNetModel, _apply_layer,
                                     _init_layer, build_plan)


def bilinear_resize(x: jnp.ndarray, new_hw: tuple[int, int]) -> jnp.ndarray:
    """Channels-first bilinear resize to (H, W) via jax.image (matches
    torch ``F.interpolate(mode='bilinear', align_corners=False)``)."""
    b, c, h, w = x.shape
    return jax.image.resize(x, (b, c, *new_hw), method="bilinear")


class SuperResModel(UNetModel):
    """UNet conditioned on an upsampled low-res image."""

    def __init__(self, cfg: UNetConfig):
        cfg = dataclasses.replace(cfg, in_channels=cfg.in_channels * 2)
        super().__init__(cfg)

    def apply(self, params, x, timesteps, low_res=None, y=None, **kw):
        assert low_res is not None, "SuperResModel needs low_res"
        new_hw = x.shape[2:]
        upsampled = bilinear_resize(low_res, tuple(new_hw))
        x = jnp.concatenate([x, upsampled], axis=1)
        return super().apply(params, x, timesteps, y=y, **kw)


# ---------------------------------------------------------------------------
# EncoderUNetModel
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class EncoderPlan:
    input_blocks: tuple
    middle_block: tuple
    ch_final: int
    feature_size: int


def build_encoder_plan(cfg: UNetConfig) -> EncoderPlan:
    full = build_plan(cfg)
    # feature size = running sum of per-stage channels (reference bookkeeping)
    feature = 0
    ch = int(cfg.channel_mult[0] * cfg.model_channels)
    feature += ch
    for block in full.input_blocks[1:]:
        last = block[-1]
        ch = getattr(last, "out_ch", getattr(last, "ch", ch))
        feature += ch
    feature += ch  # middle block
    return EncoderPlan(full.input_blocks, full.middle_block, ch, feature)


class EncoderUNetModel:
    def __init__(self, cfg: UNetConfig, pool: str = "adaptive",
                 encoder_out_channels: int | None = None):
        self.cfg = cfg
        self.pool = pool
        self.plan = build_encoder_plan(cfg)
        self.out_channels = (encoder_out_channels
                             if encoder_out_channels is not None
                             else cfg.out_channels)

    def init(self, key):
        cfg, plan = self.cfg, self.plan
        keys = iter(jax.random.split(key, 500))
        params: dict[str, Any] = {
            "time_embed": [
                tnn.init_dense(next(keys), cfg.model_channels, cfg.emb_ch),
                tnn.init_dense(next(keys), cfg.emb_ch, cfg.emb_ch),
            ],
            "input_blocks": [
                [_init_layer(next(keys), spec) for spec in block]
                for block in plan.input_blocks
            ],
            "middle_block": [
                _init_layer(next(keys), spec) for spec in plan.middle_block],
        }
        if self.pool == "adaptive":
            params["out_norm"] = tnn.init_group_norm(plan.ch_final)
            params["out_conv"] = tnn.init_conv(
                next(keys), cfg.dims, plan.ch_final, self.out_channels, 1,
                zero=True)
        elif self.pool == "attention":
            # CLIP-style attention pool (reference AttentionPool2d,
            # src/unet.py:22-51): mean token prepended, learned positional
            # embedding, one QKV attention, out-projection, take token 0
            assert cfg.num_head_channels != -1, \
                "attention pool needs num_head_channels"
            ch = plan.ch_final
            ds = 2 ** (len(cfg.channel_mult) - 1)
            # 3-D torsos downsample only the last two axes ((1,2,2) windows,
            # unet.py DownSpec) — the depth axis keeps its full extent
            if cfg.dims == 3:
                n_tokens = cfg.image_size * (cfg.image_size // ds) ** 2
            else:
                n_tokens = (cfg.image_size // ds) ** cfg.dims
            params["out_norm"] = tnn.init_group_norm(ch)
            params["attn_pool"] = {
                "pos_emb": jax.random.normal(
                    next(keys), (n_tokens + 1, ch)) / ch ** 0.5,
                "qkv": tnn.init_dense(next(keys), ch, 3 * ch),
                "proj": tnn.init_dense(next(keys), ch, self.out_channels),
            }
        elif self.pool in ("spatial", "spatial_v2"):
            params["out_fc1"] = tnn.init_dense(next(keys), plan.feature_size,
                                               2048)
            params["out_fc2"] = tnn.init_dense(next(keys), 2048,
                                               self.out_channels)
            if self.pool == "spatial_v2":
                params["out_norm"] = tnn.init_group_norm(2048)
        else:
            raise NotImplementedError(f"Unexpected {self.pool} pooling")
        return params

    def apply(self, params, x, timesteps, *, channels_first: bool = True):
        cfg, plan = self.cfg, self.plan
        if channels_first:
            x = jnp.moveaxis(x, 1, -1)
        emb = tnn.dense(params["time_embed"][0],
                        tnn.timestep_embedding(timesteps, cfg.model_channels))
        emb = tnn.dense(params["time_embed"][1], tnn.silu(emb))

        spatial_axes = tuple(range(1, x.ndim - 1))
        results = []
        h = x.astype(cfg.torso_dtype)
        for bp, bs in zip(params["input_blocks"], plan.input_blocks):
            for p, spec in zip(bp, bs):
                h = _apply_layer(p, spec, h, emb)
            if self.pool.startswith("spatial"):
                results.append(h.astype(x.dtype).mean(axis=spatial_axes))
        for p, spec in zip(params["middle_block"], plan.middle_block):
            h = _apply_layer(p, spec, h, emb)

        if self.pool.startswith("spatial"):
            results.append(h.astype(x.dtype).mean(axis=spatial_axes))
            feats = jnp.concatenate(results, axis=-1)
            z = tnn.dense(params["out_fc1"], feats)
            if self.pool == "spatial_v2":
                z = tnn.silu(tnn.group_norm(params["out_norm"], z))
            else:
                z = jax.nn.relu(z)
            return tnn.dense(params["out_fc2"], z)

        h = h.astype(x.dtype)
        h = tnn.silu(tnn.group_norm(params["out_norm"], h))
        if self.pool == "attention":
            return self._attention_pool(params["attn_pool"], h)
        h = h.mean(axis=spatial_axes, keepdims=True)  # adaptive avg pool (1,1)
        h = tnn.conv(params["out_conv"], h)
        return h.reshape(h.shape[0], -1)

    def _attention_pool(self, p, h):
        """Reference ``AttentionPool2d.forward`` (src/unet.py:43-51) in
        channels-last: prepend the spatial mean as a class token, add the
        positional embedding, one new-order QKV attention, project, return
        token 0."""
        b, *spatial, c = h.shape
        tokens = h.reshape(b, -1, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        tokens = tokens + p["pos_emb"].astype(tokens.dtype)[None]
        qkv = tnn.dense(p["qkv"], tokens)
        heads = c // self.cfg.num_head_channels
        d = c // heads
        n = tokens.shape[1]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, heads, d)
        k = k.reshape(b, n, heads, d)
        v = v.reshape(b, n, heads, d)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(d, jnp.float32)))
        logits = jnp.einsum("bqhd,bkhd->bhqk",
                            q * scale.astype(q.dtype),
                            k * scale.astype(k.dtype),
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, n, c)
        out = tnn.dense(p["proj"], out)
        return out[:, 0]

    def __call__(self, params, x, timesteps, **kw):
        return self.apply(params, x, timesteps, **kw)


def create_classifier(
    image_size: int,
    classifier_width: int = 128,
    classifier_depth: int = 2,
    classifier_attention_resolutions: str = "32,16,8",
    classifier_use_scale_shift_norm: bool = True,
    classifier_resblock_updown: bool = True,
    classifier_pool: str = "attention",
    in_channels: int = 1,
    out_channels: int = 1000,
    dims: int = 2,
) -> EncoderUNetModel:
    """Classifier factory mirroring the reference
    ``script_util.create_classifier`` defaults (``script_util.py:189-251``),
    including the CLIP-style ``attention`` pooling head."""
    if image_size == 512:
        channel_mult = (0.5, 1, 1, 2, 2, 4, 4)
    elif image_size == 256:
        channel_mult = (1, 1, 2, 2, 4, 4)
    elif image_size == 128:
        channel_mult = (1, 1, 2, 3, 4)
    elif image_size == 64:
        channel_mult = (1, 2, 3, 4)
    else:
        channel_mult = (1, 2)

    attention_ds = tuple(image_size // int(r)
                         for r in classifier_attention_resolutions.split(","))
    cfg = UNetConfig(
        image_size=image_size,
        in_channels=in_channels,
        model_channels=classifier_width,
        out_channels=out_channels,
        num_res_blocks=classifier_depth,
        attention_resolutions=attention_ds,
        channel_mult=channel_mult,
        dims=dims,
        num_head_channels=64,
        use_scale_shift_norm=classifier_use_scale_shift_norm,
        resblock_updown=classifier_resblock_updown,
    )
    return EncoderUNetModel(cfg, pool=classifier_pool,
                            encoder_out_channels=out_channels)


def create_sr_model(
    large_size: int,
    small_size: int,
    num_channels: int,
    num_res_blocks: int,
    out_channels: int = 1,
    learn_sigma: bool = False,
    attention_resolutions: str = "16",
    num_heads: int = 1,
    num_head_channels: int = -1,
    use_scale_shift_norm: bool = False,
    dropout: float = 0.0,
    dims: int = 2,
) -> SuperResModel:
    """Super-resolution model factory (reference ``script_util.py:253-321``
    ``sr_create_model``)."""
    if large_size == 512 or large_size == 256:
        channel_mult = (1, 1, 2, 2, 4, 4)
    elif large_size == 64:
        channel_mult = (1, 2, 3, 4)
    else:
        channel_mult = (1, 2, 4)
    attention_ds = tuple(large_size // int(r)
                         for r in attention_resolutions.split(","))
    cfg = UNetConfig(
        image_size=large_size,
        in_channels=out_channels,
        model_channels=num_channels,
        out_channels=out_channels if not learn_sigma else 2 * out_channels,
        num_res_blocks=num_res_blocks,
        attention_resolutions=attention_ds,
        channel_mult=channel_mult,
        dims=dims,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        use_scale_shift_norm=use_scale_shift_norm,
        dropout=dropout,
    )
    return SuperResModel(cfg)
