import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from confild_tpu import config as cfg
from confild_tpu.inference import (CNF_inference, decoder,
                                   pass_through_model_batch)
from confild_tpu.core import normalize as cnorm
from confild_tpu.models import cnf
from confild_tpu.models.mlp import (MLPConfig, MLPRezConfig, init_mlp,
                                    init_mlp_reznet, mlp_apply,
                                    mlp_reznet_apply)
from confild_tpu.train.cnf_trainer import CNFTrainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("cnfrun")
    rng = np.random.default_rng(0)
    coords = rng.uniform(size=(80, 2)).astype(np.float32)
    phase = np.linspace(0, np.pi, 8)[:, None, None]
    fois = np.sin(2 * np.pi * coords[None, :, :1] + phase).astype(np.float32)
    np.save(tmp_path / "fois.npy", fois)
    np.save(tmp_path / "coords.npy", coords)
    recipe = {
        "data_path": str(tmp_path / "fois.npy"),
        "coor_path": str(tmp_path / "coords.npy"),
        "save_path": str(tmp_path / "run"),
        "lumped_latent": True,
        "normalizer": {"method": "-11", "dim": 0},
        "batch_size": 4, "test_batch_size": 4, "multiGPU": 1,
        "readin_data_shape": "t N c", "batch_shape": "t N c",
        "hidden_size": 8, "epochs": 10, "loss_fn": "MSELoss",
        "test_criteria": "rMAE", "save_every": 5, "dims": 2,
        "NF": {"name": "SIRENAutodecoder_film", "num_hidden_layers": 1,
               "out_features": 1, "hidden_features": 16},
        "lr": {"nf": 1e-3, "latents": 1e-2},
    }
    (tmp_path / "case.yml").write_text(yaml.safe_dump(recipe))
    tr = CNFTrainer(cfg.basic_input(str(tmp_path / "case.yml")))
    tr.train(log_formats=())
    return tmp_path, tr


class TestCNFInference:
    def test_load_and_predict(self, trained):
        tmp_path, tr = trained
        from confild_tpu.io.checkpoint import latest_checkpoint
        ckpt, _ = latest_checkpoint(str(tmp_path / "run"))
        inf = CNF_inference(ckpt, str(tmp_path / "case.yml"),
                            str(tmp_path / "fois.npy"), use_pallas=False)
        coords = np.load(tmp_path / "coords.npy")
        pred = inf.predict(coords, [0, 1, 2], batch_size=2)
        assert pred.shape == (3, 80, 1)
        # predictions match the trainer's own decode
        ref = np.asarray(tr.infer(coords, tr.state.latents[:3]))
        np.testing.assert_allclose(pred, ref, rtol=1e-4, atol=1e-5)

    def test_grid_inference(self, trained):
        tmp_path, _ = trained
        from confild_tpu.io.checkpoint import latest_checkpoint
        ckpt, _ = latest_checkpoint(str(tmp_path / "run"))
        inf = CNF_inference(ckpt, str(tmp_path / "case.yml"),
                            str(tmp_path / "fois.npy"), use_pallas=False)
        grid = inf.create_coordinates_grid((80,))
        assert grid.shape == (80, 1)


class TestBatchedDecoders:
    def _setup(self):
        m = cnf.create_nf("SIRENAutodecoder_film", in_coord_features=2,
                          in_latent_features=8, out_features=2,
                          num_hidden_layers=1, hidden_features=16)
        params = m.init_params(jax.random.key(0))
        coords = jax.random.uniform(jax.random.key(1), (30, 2))
        latents = jax.random.normal(jax.random.key(2), (7, 8))
        xn = cnorm.Normalizer((np.ones(2, np.float32),
                               np.zeros(2, np.float32)), "-11", 0)
        yn = cnorm.Normalizer((np.ones((1, 2), np.float32),
                               -np.ones((1, 2), np.float32)), "-11", 0)
        return params, coords, latents, xn, yn

    def test_pass_through_differentiable(self):
        params, coords, latents, xn, yn = self._setup()
        out = pass_through_model_batch(coords, latents, params, xn, yn,
                                       batch_size=3, use_pallas=False)
        assert out.shape == (7, 30, 2)

        def loss(z):
            return jnp.sum(pass_through_model_batch(
                coords, z, params, xn, yn, 3, use_pallas=False) ** 2)

        g = jax.grad(loss)(latents)
        assert jnp.any(g != 0)

    def test_decoder_matches_pass_through(self):
        params, coords, latents, xn, yn = self._setup()
        a = np.asarray(pass_through_model_batch(coords, latents, params,
                                                xn, yn, 3, use_pallas=False))
        b = decoder(coords, latents, params, xn, yn, 3, use_pallas=False)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


class TestMLPPrimitives:
    @pytest.mark.parametrize("nl", ["relu", "sine", "tanh", "swish"])
    def test_mlp(self, nl):
        c = MLPConfig(3, 2, 2, 16, nonlinearity=nl)
        p = init_mlp(jax.random.key(0), c)
        out = mlp_apply(p, c, jnp.ones((5, 3)))
        assert out.shape == (5, 2)
        assert jnp.all(jnp.isfinite(out))

    def test_reznet(self):
        c = MLPRezConfig(3, 2, 2, 16, nonlinearity="relu")
        p = init_mlp_reznet(jax.random.key(0), c)
        out = mlp_reznet_apply(p, c, jnp.ones((5, 3)))
        assert out.shape == (5, 2)
