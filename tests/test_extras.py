import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from confild_tpu.models import unet as junet
from confild_tpu.models.unet_extras import (EncoderUNetModel, SuperResModel,
                                            create_classifier)
from confild_tpu.utils.img_utils import (bicubic_resize, dynamic_thresholding,
                                         mask_generator)
from confild_tpu.train.schedulers import cyclic_cosine_decay


class TestSuperRes:
    def test_forward(self):
        cfg = junet.UNetConfig(
            image_size=32, in_channels=1, model_channels=32, out_channels=1,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_heads=2)
        m = SuperResModel(cfg)
        params = m.init(jax.random.key(0))
        x = jnp.zeros((2, 1, 32, 32))
        low = jax.random.normal(jax.random.key(1), (2, 1, 16, 16))
        out = m.apply(params, x, jnp.array([0, 5]), low_res=low)
        assert out.shape == (2, 1, 32, 32)


class TestEncoder:
    @pytest.mark.parametrize("pool", ["adaptive", "spatial", "spatial_v2"])
    def test_pools(self, pool):
        cfg = junet.UNetConfig(
            image_size=32, in_channels=1, model_channels=32, out_channels=5,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_heads=2)
        m = EncoderUNetModel(cfg, pool=pool, encoder_out_channels=5)
        params = m.init(jax.random.key(0))
        out = m.apply(params, jax.random.normal(jax.random.key(1),
                                                (2, 1, 32, 32)),
                      jnp.array([0, 3]))
        assert out.shape == (2, 5)
        assert jnp.all(jnp.isfinite(out))

    def test_attention_pool_forward(self):
        cfg = junet.UNetConfig(
            image_size=32, in_channels=1, model_channels=32, out_channels=5,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_head_channels=16)
        m = EncoderUNetModel(cfg, pool="attention", encoder_out_channels=5)
        params = m.init(jax.random.key(0))
        out = m.apply(params, jax.random.normal(jax.random.key(1),
                                                (2, 1, 32, 32)),
                      jnp.array([0, 3]))
        assert out.shape == (2, 5)
        assert jnp.all(jnp.isfinite(out))

    def test_attention_pool_torch_parity(self):
        """Golden test of the pooling head vs the reference AttentionPool2d
        (src/unet.py:22-51) with ported weights."""
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(
            0, "/root/reference/UnconditionalDiffusionTraining_and_Generation")
        from src.unet import AttentionPool2d

        b, c, hw, out_ch = 2, 32, 4, 7
        ref = AttentionPool2d(hw, c, num_heads_channels=16, output_dim=out_ch)
        x = torch.randn(b, c, hw, hw)
        with torch.no_grad():
            want = ref(x).numpy()

        cfg = junet.UNetConfig(
            image_size=8 * hw, in_channels=1, model_channels=c, out_channels=1,
            num_res_blocks=1, attention_resolutions=(2,),
            channel_mult=(1, 1, 1, 1), num_head_channels=16)
        m = EncoderUNetModel(cfg, pool="attention", encoder_out_channels=out_ch)
        p = {
            "pos_emb": jnp.asarray(
                ref.positional_embedding.detach().numpy().T),
            "qkv": {
                "kernel": jnp.asarray(
                    ref.qkv_proj.weight.detach().numpy()[:, :, 0].T),
                "bias": jnp.asarray(ref.qkv_proj.bias.detach().numpy()),
            },
            "proj": {
                "kernel": jnp.asarray(
                    ref.c_proj.weight.detach().numpy()[:, :, 0].T),
                "bias": jnp.asarray(ref.c_proj.bias.detach().numpy()),
            },
        }
        h = jnp.asarray(x.numpy()).transpose(0, 2, 3, 1)  # channels-last
        got = np.asarray(m._attention_pool(p, h))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    def test_classifier_factory(self):
        m = create_classifier(image_size=32, classifier_width=32,
                              classifier_depth=1,
                              classifier_attention_resolutions="16",
                              out_channels=3)
        params = m.init(jax.random.key(0))
        out = m.apply(params, jnp.zeros((1, 1, 32, 32)), jnp.array([0]))
        assert out.shape == (1, 3)


class TestImgUtils:
    def test_box_mask(self):
        gen = mask_generator("box", mask_len_range=(4, 8), image_size=32,
                             margin=(2, 2), seed=0)
        mask = gen((1, 1, 32, 32))
        assert mask.shape == (1, 1, 32, 32)
        n_zero = int((mask == 0).sum())
        assert 16 <= n_zero <= 64  # between 4x4 and 8x8

    def test_random_mask_prob(self):
        gen = mask_generator("random", mask_prob_range=(0.3, 0.3),
                             image_size=32, seed=0)
        mask = gen((1, 1, 32, 32))
        frac = float((mask == 0).mean())
        assert abs(frac - 0.3) < 0.02

    def test_extreme_inverts(self):
        gen = mask_generator("extreme", mask_len_range=(4, 8), image_size=32,
                             margin=(2, 2), seed=0)
        mask = gen((1, 1, 32, 32))
        assert float(mask.mean()) < 0.5  # mostly zeros

    def test_std_box(self):
        gen = mask_generator("std_box", image_size=8, std_box_hstart=2,
                             std_box_wstart=3, h=2, w=2)
        mask = gen((1, 1, 8, 8))
        assert float(mask[0, 0, 2, 3]) == 0 and float(mask[0, 0, 0, 0]) == 1

    def test_dynamic_thresholding_bounds(self):
        x = 10 * jax.random.normal(jax.random.key(0), (4, 4))
        out = dynamic_thresholding(x)
        assert jnp.all(jnp.abs(out) <= 1.0)

    def test_bicubic_resize(self):
        x = jax.random.normal(jax.random.key(0), (1, 2, 16, 16))
        out = bicubic_resize(x, 0.5)
        assert out.shape == (1, 2, 8, 8)


class TestScheduler:
    def test_init_decay(self):
        s = cyclic_cosine_decay(1.0, 100, 0.1)
        assert np.isclose(float(s(0)), 1.0)
        assert np.isclose(float(s(100)), 0.1, atol=1e-3)
        assert float(s(50)) < 1.0
        # no restarts -> constant tail
        assert np.isclose(float(s(500)), 0.1)

    def test_fixed_restarts(self):
        s = cyclic_cosine_decay(1.0, 10, 0.1, restart_interval=20,
                                restart_lr=0.5)
        assert np.isclose(float(s(10)), 0.5)    # restart begins at restart_lr
        assert np.isclose(float(s(30)), 0.5)    # next cycle
        assert float(s(20)) < 0.5               # mid-cycle decays

    def test_geometric_restarts(self):
        s = cyclic_cosine_decay(1.0, 10, 0.1, restart_interval=10,
                                restart_interval_multiplier=2.0,
                                restart_lr=0.8)
        vals = [float(s(i)) for i in range(10, 80)]
        assert max(vals) <= 0.8 + 1e-6
        assert min(vals) >= 0.1 - 1e-6


class TestClassifierGuidance:
    """End-to-end classifier-guided sampling: EncoderUNetModel gradient as
    cond_fn through condition_mean (DDPM) and condition_score (DDIM) —
    reference ``gaussian_diffusion.py:356-393`` hooks."""

    def _setup(self):
        from confild_tpu.diffusion import create_gaussian_diffusion
        from confild_tpu.models import unet as junet
        from confild_tpu.models.unet_extras import create_classifier

        model = junet.create_model(image_size=16, num_channels=32,
                                   num_res_blocks=1, channel_mult="1,2",
                                   attention_resolutions="8", num_heads=2,
                                   out_channels=1)
        params = model.init(jax.random.key(0))
        clf = create_classifier(image_size=16, classifier_width=64,
                                classifier_depth=1,
                                classifier_attention_resolutions="8",
                                out_channels=4)
        clf_params = clf.init(jax.random.key(1))
        diffusion = create_gaussian_diffusion(steps=6,
                                              noise_schedule="cosine")

        def model_fn(x, t, **kw):
            return model.apply(params, x, t)

        y = jnp.array([2])
        scale = 5.0

        def cond_fn(x, t, **kw):
            def log_p(x):
                logits = clf.apply(clf_params, x, t)
                return jax.nn.log_softmax(logits, axis=-1)[
                    jnp.arange(x.shape[0]), y].sum()
            return scale * jax.grad(log_p)(x)

        return diffusion, model_fn, cond_fn

    def test_ddpm_guided(self):
        diffusion, model_fn, cond_fn = self._setup()
        key = jax.random.key(7)
        guided = diffusion.p_sample_loop(model_fn, (1, 1, 16, 16), key,
                                         cond_fn=cond_fn)
        plain = diffusion.p_sample_loop(model_fn, (1, 1, 16, 16), key)
        assert np.all(np.isfinite(np.asarray(guided)))
        # guidance shifts the trajectory (identical RNG stream otherwise)
        assert float(jnp.abs(guided - plain).max()) > 1e-6

    def test_ddim_guided(self):
        diffusion, model_fn, cond_fn = self._setup()
        key = jax.random.key(7)
        guided = diffusion.ddim_sample_loop(model_fn, (1, 1, 16, 16), key,
                                            cond_fn=cond_fn)
        plain = diffusion.ddim_sample_loop(model_fn, (1, 1, 16, 16), key)
        assert np.all(np.isfinite(np.asarray(guided)))
        assert float(jnp.abs(guided - plain).max()) > 1e-6


class TestAttentionPool3D:
    def test_forward_3d(self):
        """3-D torsos downsample only the last two axes, so the attention
        pool's positional embedding must use D * (H/ds) * (W/ds) tokens."""
        m = create_classifier(image_size=8, classifier_width=64,
                              classifier_depth=1,
                              classifier_attention_resolutions="4",
                              out_channels=3, dims=3)
        params = m.init(jax.random.key(0))
        out = m.apply(params, jnp.zeros((1, 1, 8, 8, 8)), jnp.array([0]))
        assert out.shape == (1, 3)
        assert np.all(np.isfinite(np.asarray(out)))


class TestClassifierTrainer:
    """Noised-classifier training (upstream ``classifier_train.py``'s role;
    the reference ships only the model + guidance hooks) and the trained
    ``cond_fn`` steering sampling toward the requested class."""

    @pytest.mark.slow
    def test_trains_to_separate_classes_and_guides(self, tmp_path):
        from confild_tpu.diffusion import create_gaussian_diffusion
        from confild_tpu.models.unet_extras import create_classifier
        from confild_tpu.train.classifier_trainer import (ClassifierTrainLoop,
                                                          classifier_cond_fn)
        from confild_tpu.utils import logger as tlog

        tlog.configure(str(tmp_path), [])
        # two trivially separable classes: mean -0.7 vs +0.7 images
        rng = np.random.default_rng(0)

        def data_iter():
            while True:
                y = rng.integers(0, 2, size=8)
                x = (rng.normal(size=(8, 1, 8, 8)) * 0.1
                     + (y[:, None, None, None] * 1.4 - 0.7))
                yield x.astype(np.float32), y.astype(np.int32)

        clf = create_classifier(image_size=8, classifier_width=32,
                                classifier_depth=1,
                                classifier_attention_resolutions="4",
                                out_channels=2)
        diffusion = create_gaussian_diffusion(steps=8,
                                              noise_schedule="cosine")
        loop = ClassifierTrainLoop(model=clf, diffusion=diffusion,
                                   data=data_iter(), batch_size=8, lr=3e-3,
                                   save_interval=10 ** 9,
                                   save_dir=str(tmp_path / "ck"), seed=0)
        loop.run_loop(steps=60)
        assert os.path.exists(tmp_path / "ck" / "model000060.ckpt")

        # the trained classifier separates CLEAN inputs confidently
        xs = np.concatenate([np.full((4, 1, 8, 8), -0.7, np.float32),
                             np.full((4, 1, 8, 8), 0.7, np.float32)])
        t0 = jnp.zeros((8,), jnp.int32)
        logits = clf.apply(loop.state.params, jnp.asarray(xs), t0)
        pred = np.asarray(jnp.argmax(logits, -1))
        assert (pred == np.array([0] * 4 + [1] * 4)).mean() >= 0.9

        # cond_fn steers a neutral sampler toward the asked-for class
        def model_fn(x, t, **kw):
            return jnp.zeros_like(x)  # eps-pred 0: unguided mean ~ 0

        key = jax.random.key(3)
        shape = (4, 1, 8, 8)
        lo = diffusion.p_sample_loop(
            model_fn, shape, key,
            cond_fn=classifier_cond_fn(clf, loop.state.params, scale=20.0),
            model_kwargs={"y": jnp.zeros((4,), jnp.int32)})
        hi = diffusion.p_sample_loop(
            model_fn, shape, key,
            cond_fn=classifier_cond_fn(clf, loop.state.params, scale=20.0),
            model_kwargs={"y": jnp.ones((4,), jnp.int32)})
        assert float(jnp.mean(hi)) > float(jnp.mean(lo))
