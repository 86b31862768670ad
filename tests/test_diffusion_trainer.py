import os

import jax
import numpy as np
import pytest

from confild_tpu.diffusion import create_gaussian_diffusion
from confild_tpu.models import unet as junet
from confild_tpu.train.diffusion_trainer import (TrainLoop,
                                                 load_latent_image_data)
from confild_tpu.utils import logger as tlog


@pytest.fixture()
def tiny_setup(tmp_path):
    rng = np.random.default_rng(0)
    train = rng.normal(size=(32, 16, 16)).astype(np.float32)
    valid = rng.normal(size=(8, 16, 16)).astype(np.float32)
    np.save(tmp_path / "train.npy", train)
    np.save(tmp_path / "valid.npy", valid)

    model = junet.create_model(
        image_size=16, num_channels=32, num_res_blocks=1,
        channel_mult="1,2", attention_resolutions="8", num_heads=2)
    diffusion = create_gaussian_diffusion(steps=20, noise_schedule="cosine")
    data, vdata, (mx, mn) = load_latent_image_data(
        str(tmp_path / "train.npy"), str(tmp_path / "valid.npy"),
        batch_size=8)
    return model, diffusion, data, vdata, tmp_path


class TestTrainLoop:
    @pytest.mark.slow
    def test_steps_and_checkpoint(self, tiny_setup, tmp_path):
        model, diffusion, data, vdata, _ = tiny_setup
        tlog.configure(str(tmp_path / "logs"), ["csv"])
        loop = TrainLoop(
            model=model, diffusion=diffusion, data=data, valid_data=vdata,
            batch_size=8, lr=1e-4, ema_rate="0.5,0.9",
            log_interval=2, save_interval=4, lr_anneal_steps=9,
            save_dir=str(tmp_path / "ckpts"))
        loop.run_loop()
        assert int(loop.state.step) == 9
        assert os.path.exists(tmp_path / "ckpts" / "model000004.ckpt")
        assert os.path.exists(tmp_path / "ckpts" / "ema_0.5_000004.ckpt")
        assert os.path.exists(tmp_path / "ckpts" / "opt000004.ckpt")
        # final save at loop end
        assert os.path.exists(tmp_path / "ckpts" / "model000009.ckpt")

    @pytest.mark.slow
    def test_device_data_path(self, tiny_setup, tmp_path):
        """The device-resident dataset path (batches gathered on-device
        inside the jitted scan — no host->device batch traffic) must train,
        log, checkpoint and guard like the iterator path."""
        model, diffusion, _, _, _ = tiny_setup
        rng = np.random.default_rng(1)
        dataset = rng.normal(size=(32, 1, 16, 16)).astype(np.float32)
        tlog.configure(str(tmp_path / "logs_dev"), ["csv"])
        loop = TrainLoop(
            model=model, diffusion=diffusion, data=None,
            device_data=dataset,
            batch_size=8, lr=1e-4, log_interval=2, save_interval=6,
            lr_anneal_steps=6, steps_per_call=3,
            save_dir=str(tmp_path / "ckpts_dev"))
        loop.run_loop()
        assert int(loop.state.step) == 6
        assert os.path.exists(tmp_path / "ckpts_dev" / "model000006.ckpt")
        import csv
        with open(tmp_path / "logs_dev" / "progress.csv") as f:
            rows = list(csv.DictReader(f))
        losses = [float(r["loss"]) for r in rows if r.get("loss")]
        assert losses and all(np.isfinite(losses))
        with pytest.raises(ValueError, match="valid_data"):
            TrainLoop(model=model, diffusion=diffusion, data=None,
                      device_data=dataset, valid_data=iter([]),
                      batch_size=8, save_dir=str(tmp_path / "x"))

    @pytest.mark.slow
    def test_resume(self, tiny_setup, tmp_path):
        model, diffusion, data, vdata, _ = tiny_setup
        tlog.configure(str(tmp_path / "logs"), [])
        loop = TrainLoop(
            model=model, diffusion=diffusion, data=data, valid_data=None,
            batch_size=8, lr=1e-4, lr_anneal_steps=3,
            save_dir=str(tmp_path / "ckpts"))
        loop.run_loop()
        ckpt = str(tmp_path / "ckpts" / "model000003.ckpt")
        assert os.path.exists(ckpt)
        # lr_anneal_steps is a TOTAL horizon (reference train_util.py:156-160:
        # run while step + resume_step < lr_anneal_steps): resuming at 3 with
        # a total of 5 runs exactly 2 more steps
        loop2 = TrainLoop(
            model=model, diffusion=diffusion, data=data, valid_data=None,
            batch_size=8, lr=1e-4, lr_anneal_steps=5,
            resume_checkpoint=ckpt, save_dir=str(tmp_path / "ckpts"))
        assert loop2.resume_step == 3
        loop2.run_loop()
        assert int(loop2.state.step) == 5
        # resuming past the horizon runs nothing
        loop3 = TrainLoop(
            model=model, diffusion=diffusion, data=data, valid_data=None,
            batch_size=8, lr=1e-4, lr_anneal_steps=2,
            resume_checkpoint=ckpt, save_dir=str(tmp_path / "ckpts"))
        loop3.run_loop()
        assert int(loop3.state.step) == 3

    @pytest.mark.slow
    def test_microbatch_equivalence(self, tiny_setup, tmp_path):
        """Grad accumulation over microbatches must match the full batch."""
        model, diffusion, data, vdata, _ = tiny_setup
        tlog.configure(str(tmp_path / "logs"), [])
        batch, _ = next(data)
        import jax.numpy as jnp
        batch = jnp.asarray(batch)

        full = TrainLoop(model=model, diffusion=diffusion, data=data,
                         batch_size=8, microbatch=-1, lr=1e-4,
                         save_dir=str(tmp_path / "a"))
        micro = TrainLoop(model=model, diffusion=diffusion, data=data,
                          batch_size=8, microbatch=4, lr=1e-4,
                          save_dir=str(tmp_path / "b"))
        # identical init (same seed) and identical step RNG
        key = jax.random.key(7)
        s1, m1 = full._train_step(full.state, batch, key)
        s2, m2 = micro._train_step(micro.state, batch, key)
        # loss is mean over all samples either way (weights uniform)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-4)

    @pytest.mark.slow
    def test_ema_moves_toward_params(self, tiny_setup, tmp_path):
        model, diffusion, data, _, _ = tiny_setup
        tlog.configure(str(tmp_path / "logs"), [])
        loop = TrainLoop(model=model, diffusion=diffusion, data=data,
                         batch_size=8, lr=1e-2, ema_rate="0.5",
                         lr_anneal_steps=3, save_dir=str(tmp_path / "c"))
        p0 = jax.tree.leaves(loop.state.params)[0].copy()
        loop.run_loop()
        ema = jax.tree.leaves(loop.state.ema_params[0])[0]
        p_now = jax.tree.leaves(loop.state.params)[0]
        # EMA lags behind current params but has moved from init
        assert not np.allclose(np.asarray(ema), np.asarray(p0))
        assert not np.allclose(np.asarray(ema), np.asarray(p_now))

    @pytest.mark.slow
    def test_run_steps_includes_valid_pass(self, tiny_setup, tmp_path):
        """steps_per_call>1 must still run the per-step validation forward
        (reference train_util.py:226-254)."""
        model, diffusion, data, vdata, _ = tiny_setup
        logger = tlog.configure(str(tmp_path / "logs_rs"), [])
        loop = TrainLoop(
            model=model, diffusion=diffusion, data=data, valid_data=vdata,
            batch_size=8, lr=1e-4, lr_anneal_steps=6,
            save_dir=str(tmp_path / "d"), steps_per_call=3)
        loop.run_steps(3)
        assert "valid_mse" in logger.name2val
        assert np.isfinite(logger.name2val["valid_mse"])
        assert int(loop.state.step) == 3
