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


def build_demo_unet(n_snap: int, latent: int, num_channels: int = 64,
                    channel_mult: str = "1,2,2", num_head_channels: int = 16):
    """ADM U-Net over (1, n_snap, latent) latent images, attention at
    downsample factor 4 regardless of latent width.

    ``num_channels``/``channel_mult`` size the prior (the reference's case
    recipes use 128ch x "1,1,2,2,4,4" at image 384,
    ``UnconditionalDiffusionTraining_and_Generation/training_recipes/
    case4.yml``; the demo default is a lighter 64ch x 3 levels).  Deeper
    mults keep attention at the DEEPEST level the mult reaches, capped at
    the time-axis extent (a 64-row window survives at most ds16 before the
    time axis degenerates)."""
    from confild_tpu.models import unet as junet

    img = max(n_snap, latent)
    n_levels = len(str(channel_mult).split(","))
    if n_levels <= 3:
        # legacy demo architecture: attention at ds4 only (checkpoint
        # compatibility for every pre-existing run dir)
        attn = f"{img // 4}"
    else:
        # deeper priors: attention at the two deepest levels (the
        # reference's multi-resolution attention pattern)
        max_ds = min(2 ** (n_levels - 1), 16)
        attn = f"{img // max_ds},{img // (max_ds // 2)}"
    return junet.create_model(
        image_size=img, num_channels=num_channels, num_res_blocks=2,
        channel_mult=channel_mult,
        attention_resolutions=attn,
        num_heads=4, num_head_channels=num_head_channels, use_bf16=True)


def save_demo_unet_config(dckpt_dir: str, n_snap: int, latent: int,
                          **overrides):
    """Persist the demo UNet construction args next to the diffusion
    checkpoints so every consumer (demo_report, demo_conditional,
    respacing study) rebuilds the IDENTICAL architecture — a silent
    structural mismatch corrupts loads (see module docstring).

    On a run dir that already carries a config (a resume), the CLI-derived
    config must MATCH the persisted one: overwriting would re-stamp
    unet.json for checkpoints trained under a different architecture and
    hand every downstream consumer the wrong model."""
    import glob
    import json
    import os
    cfg = {"n_snap": n_snap, "latent": latent, **overrides}
    os.makedirs(dckpt_dir, exist_ok=True)
    path = os.path.join(dckpt_dir, "unet.json")
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if prev != cfg:
            raise ValueError(
                f"resume mismatch: {path} holds {prev} but this run was "
                f"configured for {cfg} — rerun with matching "
                "--unet-channels/--unet-mult or use a fresh run dir")
        return cfg
    if glob.glob(os.path.join(dckpt_dir, "model*.ckpt")):
        raise ValueError(
            f"{dckpt_dir} holds model checkpoints but no unet.json — "
            "a pre-config legacy run dir cannot be safely re-stamped; "
            "use a fresh run dir")
    with open(path, "w") as f:
        json.dump(cfg, f)
    return cfg


def load_demo_unet(dckpt_dir: str, n_snap: int, latent: int):
    """Rebuild the demo UNet from the run dir's persisted config;
    legacy run dirs without ``unet.json`` get the historical default."""
    import json
    import os
    path = os.path.join(dckpt_dir, "unet.json")
    if os.path.exists(path):
        with open(path) as f:
            cfg = json.load(f)
        if cfg.get("n_snap", n_snap) != n_snap or \
                cfg.get("latent", latent) != latent:
            raise ValueError(f"unet.json {cfg} does not match the run's "
                             f"latent-image shape ({n_snap}, {latent})")
        kw = {k: v for k, v in cfg.items() if k not in ("n_snap", "latent")}
        return build_demo_unet(n_snap, latent, **kw)
    return build_demo_unet(n_snap, latent)
