"""Shared model construction for the turbulence demo pipeline.

The stage-2 UNet must be constructed identically by the trainer
(demo_turbulence.py), the quality report (demo_report.py), and the
conditional-DPS experiment (demo_conditional.py) or checkpoints fail to
load — and a silent structural mismatch is worse than a load failure:
attention_resolutions entries are divided into image_size to obtain
downsample factors, so a fixed "16,8" at image_size=128 resolves to
ds {8,16}, which the 3-level UNet never reaches, dropping every
non-middle attention block (measured on the demo: integral-timescale
ratio collapses 0.88 -> 0.61). Deriving the entry from the image size
keeps attention at ds=4 — the deepest level the channel_mult "1,2,2"
UNet reaches — for every latent width.
"""

from __future__ import annotations


def build_demo_unet(n_snap: int, latent: int):
    """ADM U-Net over (1, n_snap, latent) latent images, attention at
    downsample factor 4 regardless of latent width."""
    from confild_tpu.models import unet as junet

    img = max(n_snap, latent)
    return junet.create_model(
        image_size=img, num_channels=64, num_res_blocks=2,
        channel_mult="1,2,2",
        attention_resolutions=f"{img // 4}",
        num_heads=4, num_head_channels=16, use_bf16=True)
