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

import numpy as np


def sliding_windows(per_traj: "np.ndarray", window: int, stride: int):
    """(n_traj, n_snap, ...) -> (n_traj * n_win, window, ...) sliding
    temporal windows, the reference's diffusion data prep (its case recipes
    train on pre-windowed latent segments rather than whole trajectories —
    ``UnconditionalDiffusionTraining_and_Generation/scripts/train.py:44-56``
    loads an (n_samples, time_length, latent_length) array built upstream).
    ``window == n_snap`` is the identity (one window per trajectory)."""
    n_snap = per_traj.shape[1]
    if window > n_snap or (n_snap - window) % stride:
        raise ValueError(f"window {window} / stride {stride} do not tile "
                         f"{n_snap} snapshots")
    starts = range(0, n_snap - window + 1, stride)
    return np.stack([per_traj[i, s:s + window]
                     for i in range(per_traj.shape[0]) for s in starts])


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
