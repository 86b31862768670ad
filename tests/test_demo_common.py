"""Structural regression tests for the shared demo UNet construction.

Guards the bug where a fixed ``attention_resolutions="16,8"`` at
image_size=128 resolved to downsample factors {8, 16} — unreachable by
the 3-level demo UNet — silently dropping every non-middle attention
block (integral-timescale ratio collapsed 0.88 -> 0.61 on the demo).
"""

import jax
import jax.numpy as jnp
import pytest

from examples.demo_common import build_demo_unet


def _attn_count(model):
    plan = model.plan
    blocks = (list(plan.input_blocks) + [plan.middle_block]
              + list(plan.output_blocks))
    return sum(1 for blk in blocks for spec in blk
               if type(spec).__name__ == "AttnSpec")


@pytest.mark.parametrize("latent", [64, 128, 256])
def test_attention_present_at_every_latent_width(latent):
    model = build_demo_unet(64, latent)
    # 2 input-res-block attns at ds=4 + middle + 3 output-res-block attns
    assert _attn_count(model) == 6


def test_latent64_plan_matches_legacy_config():
    """The derived attention entries must keep the original latent-64
    architecture bit-for-bit (its trained checkpoints stay loadable)."""
    from confild_tpu.models import unet as junet

    legacy = junet.create_model(
        image_size=64, num_channels=64, num_res_blocks=2,
        channel_mult="1,2,2", attention_resolutions="16,8",
        num_heads=4, num_head_channels=16, use_bf16=True)
    derived = build_demo_unet(64, 64)
    assert derived.plan == legacy.plan
    p_l = legacy.init(jax.random.key(0))
    p_d = derived.init(jax.random.key(0))
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: jnp.array_equal(a, b), p_l, p_d))
    assert chex_equal


def test_deep_mult_gets_two_attention_levels():
    """Deeper-than-legacy mults place attention at the two deepest levels
    (the reference's multi-resolution pattern, its case4.yml uses
    attention_resolutions '32,16,8' with a 6-level mult)."""
    model = build_demo_unet(64, 256, num_channels=96,
                            channel_mult="1,1,2,2,4")
    assert {16, 8} <= set(model.cfg.attention_resolutions)
    assert _attn_count(model) > 6


def test_unet_config_round_trip(tmp_path):
    """save_demo_unet_config + load_demo_unet rebuild the identical plan;
    a shape mismatch is rejected instead of corrupting a load."""
    from examples.demo_common import load_demo_unet, save_demo_unet_config

    save_demo_unet_config(str(tmp_path), 64, 256, num_channels=96,
                          channel_mult="1,1,2,2,4")
    built = build_demo_unet(64, 256, num_channels=96,
                            channel_mult="1,1,2,2,4")
    loaded = load_demo_unet(str(tmp_path), 64, 256)
    assert loaded.plan == built.plan
    with pytest.raises(ValueError, match="unet.json"):
        load_demo_unet(str(tmp_path), 64, 128)


def test_legacy_run_dir_without_unet_json(tmp_path):
    from examples.demo_common import load_demo_unet

    assert load_demo_unet(str(tmp_path), 64, 64).plan == \
        build_demo_unet(64, 64).plan


@pytest.mark.slow
def test_wide_latent_forward_runs():
    model = build_demo_unet(64, 128)
    params = model.init(jax.random.key(0))
    x = jnp.zeros((1, 1, 64, 128), jnp.float32)
    out = model.apply(params, x, jnp.array([5]))
    assert out.shape == (1, model.cfg.out_channels, 64, 128)


class TestSlidingWindows:
    """The diffusion stage's sliding-window data prep (reference trains on
    pre-windowed latent segments; scripts/train.py:44-56 loads the windowed
    array built upstream)."""

    def test_counts_and_content(self):
        import numpy as np
        from examples.demo_common import sliding_windows
        x = np.arange(2 * 16 * 3).reshape(2, 16, 3)
        w = sliding_windows(x, window=8, stride=4)
        # (16-8)/4+1 = 3 windows per trajectory
        assert w.shape == (6, 8, 3)
        np.testing.assert_array_equal(w[0], x[0, 0:8])
        np.testing.assert_array_equal(w[1], x[0, 4:12])
        np.testing.assert_array_equal(w[5], x[1, 8:16])

    def test_identity_when_window_is_full_length(self):
        import numpy as np
        from examples.demo_common import sliding_windows
        x = np.random.default_rng(0).normal(size=(3, 8, 2))
        np.testing.assert_array_equal(sliding_windows(x, 8, 4), x)

    def test_rejects_non_tiling(self):
        import numpy as np
        from examples.demo_common import sliding_windows
        x = np.zeros((1, 10, 1))
        with pytest.raises(ValueError, match="tile"):
            sliding_windows(x, 4, 4)
        with pytest.raises(ValueError, match="tile"):
            sliding_windows(x, 12, 1)
