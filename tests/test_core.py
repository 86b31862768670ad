import os

import numpy as np
import pytest

from confild_tpu.core import normalize, packing, schedules, slicing
from confild_tpu import config as cfg


class TestNormalize:
    @pytest.mark.parametrize("method", ["-11", "01", "ms"])
    @pytest.mark.parametrize("dim", [None, 0])
    def test_roundtrip(self, method, dim):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(50, 7)).astype(np.float64)
        n = normalize.Normalizer(method=method, dim=dim)
        xn = n.fit_normalize(x)
        assert np.max(np.abs(n.denormalize(xn) - x)) < 1e-12

    def test_minus11_range(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(2.0, 9.0, size=(100, 3))
        n = normalize.Normalizer(method="-11", dim=0)
        xn = n.fit_normalize(x)
        assert np.isclose(xn.max(), 1.0) and np.isclose(xn.min(), -1.0)
        # per-column extrema hit the bounds when dim=0
        assert np.allclose(xn.max(axis=0), 1.0)
        assert np.allclose(xn.min(axis=0), -1.0)

    def test_ms_matches_torch_bessel(self):
        # torch.std defaults to the unbiased (ddof=1) estimator.
        rng = np.random.default_rng(2)
        x = rng.normal(size=(64, 4))
        params = normalize.fit(x, "ms", dim=0)
        assert np.allclose(params[1], np.std(x, axis=0, keepdims=True, ddof=1))

    def test_none(self):
        x = np.arange(6.0).reshape(2, 3)
        n = normalize.Normalizer(method="none")
        assert np.array_equal(n.fit_normalize(x), x)
        assert np.array_equal(n.denormalize(x), x)

    def test_fixed_params_not_refit(self):
        params = (np.array([2.0]), np.array([0.0]))
        n = normalize.Normalizer(params=params, method="-11")
        out = n.fit_normalize(np.array([[1.0]]))
        # (1-0)/(2-0)*2-1 = 0
        assert np.allclose(out, 0.0)


class TestSchedules:
    def test_linear_schedule_values(self):
        betas = schedules.get_named_beta_schedule("linear", 1000)
        assert betas.dtype == np.float64
        assert np.isclose(betas[0], 0.0001) and np.isclose(betas[-1], 0.02)

    def test_cosine_schedule_bounds(self):
        betas = schedules.get_named_beta_schedule("cosine", 1000)
        assert (betas > 0).all() and (betas <= 0.999).all()

    def test_posterior_identities(self):
        s = schedules.named_schedule("cosine", 100)
        # coef1 + coef2 * sqrt(alphabar_t/alphabar_{t-1}) ~ relation:
        # posterior mean of x0=x_t=1 should equal
        # coef1 + coef2, and for t>0 the variance is positive
        assert (s.posterior_variance[1:] > 0).all()
        # alphas_cumprod recursion
        alphas = 1 - s.betas
        assert np.allclose(np.cumprod(alphas), s.alphas_cumprod)
        # posterior mean coefficients sum to <= 1-ish sanity: for x_start ==
        # x_t == x, mean -> x when t -> 0
        m0 = s.posterior_mean_coef1[0] + s.posterior_mean_coef2[0]
        assert np.isclose(m0, 1.0, atol=1e-10)

    def test_fixed_large_table(self):
        s = schedules.named_schedule("linear", 50)
        assert np.isclose(s.fixed_large_variance[0], s.posterior_variance[1])
        assert np.allclose(s.fixed_large_variance[1:], s.betas[1:])

    def test_ddim_respacing_reproduces_alphabar_subset(self):
        base = schedules.named_schedule("cosine", 1000)
        spaced = schedules.named_schedule("cosine", 1000, "ddim50")
        assert spaced.num_timesteps == 50
        kept = spaced.timestep_map
        assert np.allclose(spaced.alphas_cumprod, base.alphas_cumprod[kept])

    def test_space_timesteps_sections(self):
        steps = schedules.space_timesteps(300, [10, 15, 20])
        assert len(steps) == 45

    def test_extract_broadcast(self):
        import jax.numpy as jnp
        s = schedules.named_schedule("linear", 100).to_device()
        t = jnp.array([0, 9])
        out = schedules.extract(s.betas, t, broadcast_ndim=4)
        assert out.shape == (2, 1, 1, 1)


class TestPacking:
    def test_pack_unpack(self):
        x = np.arange(24.0).reshape(2, 3, 4)
        assert np.array_equal(packing.unpack_latents(packing.pack_latents(x)), x)

    def test_grid(self):
        g = packing.create_coordinates_grid((3, 5))
        assert g.shape == (3, 5, 2)
        assert g[0, 0, 0] == 0 and g[-1, -1, 0] == 1 and g[-1, -1, 1] == 1
        # ij indexing: first channel varies along axis 0
        assert np.allclose(g[:, 0, 0], np.linspace(0, 1, 3))

    def test_reconstruct_frame(self):
        mask = np.array([[True, False], [False, True]])
        vals = np.array([[1.0], [2.0]])
        out = packing.reconstruct_frame(vals, mask, (2, 2), fill_value=-1.0)
        assert out.shape == (2, 2, 1)
        assert out[0, 0, 0] == 1.0 and out[1, 1, 0] == 2.0
        assert out[0, 1, 0] == -1.0

    def test_minmax_roundtrip(self):
        x = np.random.default_rng(0).uniform(-3, 8, size=(4, 5))
        lo, hi = x.min(), x.max()
        xn = packing.minmax_to_unit_interval(x, hi, lo)
        assert np.allclose(packing.unit_interval_to_minmax(xn, hi, lo), x)


class TestSlicing:
    def test_indices2slice(self):
        s = slicing.indices2slice(["3:-1:2", ":", "5", [1, 2]])
        assert s == (slice(3, -1, 2), slice(None, None, None), 5, [1, 2])

    def test_apply(self):
        x = np.arange(100).reshape(10, 10)
        s = slicing.indices2slice(["2:5", ":"])
        assert np.array_equal(x[s], x[2:5, :])


class TestConfig:
    def test_basic_input(self, tmp_path):
        p = tmp_path / "case.yml"
        p.write_text("batch_size: 64\nNF:\n  name: SIRENAutodecoder_film\n")
        c = cfg.basic_input(str(p))
        assert c.batch_size == 64
        assert c.NF["name"] == "SIRENAutodecoder_film"
        assert "batch_size" in c
        assert c.get("missing", 5) == 5

    def test_build_component(self):
        registry = {
            "adder": lambda a, b: a + b,
            "wrap": lambda inner, k: (inner, k),
        }
        spec = {"name": "wrap", "kwargs": {"inner": {"name": "adder", "kwargs": {"a": 1, "b": 2}}, "k": 7}}
        assert cfg.build_component(spec, registry) == (3, 7)

    def test_unknown_component(self):
        with pytest.raises(KeyError):
            cfg.build_component("nope", {})


class TestCheckpointIO:
    def test_pickle_roundtrip(self, tmp_path):
        from confild_tpu.io import checkpoint as ck
        import jax.numpy as jnp
        tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": [jnp.ones(4), 7]}
        p = str(tmp_path / "x.ckpt")
        ck.save_pytree(p, tree)
        out = ck.load_pytree(p)
        assert np.allclose(out["a"], np.arange(6.0).reshape(2, 3))
        assert out["b"][1] == 7

    def test_latest_checkpoint_discovery(self, tmp_path):
        from confild_tpu.io import checkpoint as ck
        for i in (3, 10, 7):
            ck.save_pytree(str(tmp_path / f"checkpoint_{i}.ckpt"), {"i": i})
        path, idx = ck.latest_checkpoint(str(tmp_path))
        assert idx == 10 and path.endswith("checkpoint_10.ckpt")

    def test_parse_resume_step(self):
        from confild_tpu.io import checkpoint as ck
        assert ck.parse_resume_step("/a/b/model123456.ckpt") == 123456
        assert ck.parse_resume_step("nonsense.txt") == 0

    def test_latest_checkpoint_recovers_stranded_old_dir(self, tmp_path):
        """save_pytree renames a directory checkpoint to *.old before
        replacing it with the new file; a crash in that window must not
        make the checkpoint invisible to resume discovery."""
        import os
        from confild_tpu.io import checkpoint as ck
        ck.save_pytree(str(tmp_path / "checkpoint_4.ckpt"), {"i": 4})
        # simulate the crash window: data stranded under .old, target gone
        stranded = tmp_path / "checkpoint_9.ckpt.old"
        os.makedirs(stranded)
        ck.save_pytree(str(stranded / "payload.ckpt"), {"i": 9})
        path, idx = ck.latest_checkpoint(str(tmp_path))
        assert idx == 9 and path.endswith("checkpoint_9.ckpt")
        assert os.path.isdir(path) and not stranded.exists()
        # a stranded .old NEXT TO a live target is stale — left alone
        os.makedirs(str(tmp_path / "checkpoint_4.ckpt.old"))
        path, idx = ck.latest_checkpoint(str(tmp_path))
        assert idx == 9
        assert os.path.isdir(str(tmp_path / "checkpoint_4.ckpt.old"))

    def test_orbax_roundtrip(self, tmp_path):
        from confild_tpu.io import checkpoint as ck
        import jax.numpy as jnp
        tree = {"w": jnp.ones((4, 4)), "step": jnp.asarray(3)}
        p = str(tmp_path / "orbax_ckpt")
        ck.save_sharded(p, tree)
        out = ck.restore_sharded(p)
        assert np.allclose(out["w"], 1.0)
        assert int(out["step"]) == 3

    def test_rotate_cnf_checkpoints(self, tmp_path):
        from confild_tpu.io import checkpoint as ck
        for i in (1, 5, 3, 9, 7):
            ck.save_pytree(str(tmp_path / f"checkpoint_{i}.ckpt"), {"i": i})
        deleted = ck.rotate_checkpoints(str(tmp_path), keep=2, kind="cnf")
        left = sorted(os.path.basename(p) for p in
                      __import__("glob").glob(str(tmp_path / "*.ckpt")))
        assert left == ["checkpoint_7.ckpt", "checkpoint_9.ckpt"]
        assert len(deleted) == 3
        # keep=0 / keep>present are no-ops
        assert ck.rotate_checkpoints(str(tmp_path), keep=0) == []
        assert ck.rotate_checkpoints(str(tmp_path), keep=5) == []

    def test_rotate_diffusion_triplets(self, tmp_path):
        """Diffusion rotation removes model/ema/opt generations as a UNIT so
        a kept model always has its EMA and optimizer siblings."""
        from confild_tpu.io import checkpoint as ck
        for step in (10, 20, 30):
            for name in (f"model{step:06d}.ckpt",
                         f"ema_0.9999_{step:06d}.ckpt",
                         f"opt{step:06d}.ckpt"):
                ck.save_pytree(str(tmp_path / name), {"s": step})
        ck.rotate_checkpoints(str(tmp_path), keep=1, kind="diffusion")
        left = sorted(os.path.basename(p) for p in
                      __import__("glob").glob(str(tmp_path / "*.ckpt")))
        assert left == ["ema_0.9999_000030.ckpt", "model000030.ckpt",
                        "opt000030.ckpt"]

    @pytest.mark.slow
    def test_trainloop_keep_checkpoints(self, tmp_path):
        """TrainLoop(keep_checkpoints=1) leaves only the newest triplet."""
        import glob as _glob

        import jax
        from confild_tpu.diffusion import create_gaussian_diffusion
        from confild_tpu.models import unet as junet
        from confild_tpu.train.diffusion_trainer import TrainLoop
        from confild_tpu.utils import logger as tlog

        tlog.configure(str(tmp_path / "logs"), [])
        model = junet.create_model(
            image_size=8, num_channels=8, num_res_blocks=1,
            channel_mult="1", attention_resolutions="8", num_heads=1)
        diffusion = create_gaussian_diffusion(steps=4,
                                              noise_schedule="cosine")
        data = iter(lambda: (np.zeros((4, 1, 8, 8), np.float32), {}), None)
        loop = TrainLoop(model=model, diffusion=diffusion, data=data,
                         batch_size=4, lr=1e-4, lr_anneal_steps=6,
                         save_interval=2, keep_checkpoints=1,
                         save_dir=str(tmp_path / "ck"))
        loop.run_loop()
        models = sorted(_glob.glob(str(tmp_path / "ck" / "model*.ckpt")))
        assert [os.path.basename(m) for m in models] == ["model000006.ckpt"]
