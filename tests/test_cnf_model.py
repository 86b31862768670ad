import numpy as np
import jax
import jax.numpy as jnp
import pytest

from confild_tpu.models import cnf


class TestSirenFilm:
    def _model(self):
        return cnf.create_nf(
            "SIRENAutodecoder_film",
            in_coord_features=2, in_latent_features=16, out_features=3,
            num_hidden_layers=4, hidden_features=32)

    def test_shapes(self):
        m = self._model()
        params = m.init_params(jax.random.key(0))
        coords = jnp.zeros((100, 2))
        latents = jnp.zeros((1, 16))
        out = m(params, coords, latents)
        assert out.shape == (100, 3)

    def test_batched_broadcast(self):
        m = self._model()
        params = m.init_params(jax.random.key(0))
        coords = jnp.ones((7, 100, 2)) * 0.3
        latents = jax.random.normal(jax.random.key(1), (7, 1, 16))
        out = m(params, coords, latents)
        assert out.shape == (7, 100, 3)
        # different latents must give different fields at the same coords
        assert not jnp.allclose(out[0], out[1])

    def test_layer_counts(self):
        m = self._model()
        params = m.init_params(jax.random.key(0))
        # net1: num_hidden_layers + 2, net2: num_hidden_layers + 1
        assert len(params["net1"]) == 6
        assert len(params["net2"]) == 5
        assert all("bias" not in l for l in params["net2"])

    def test_init_ranges(self):
        m = self._model()
        params = m.init_params(jax.random.key(0))
        w_first = params["net1"][0]["kernel"]
        assert jnp.abs(w_first).max() <= 1 / 2  # first layer ±1/fan_in
        w_mid = params["net1"][1]["kernel"]
        bound = np.sqrt(6 / 32) / 30.0
        assert jnp.abs(w_mid).max() <= bound

    def test_differentiable_wrt_latents(self):
        m = self._model()
        params = m.init_params(jax.random.key(0))
        coords = jax.random.normal(jax.random.key(1), (50, 2))

        def loss(z):
            return jnp.sum(m(params, coords, z) ** 2)

        g = jax.grad(loss)(jnp.ones((1, 16)) * 0.1)
        assert g.shape == (1, 16)
        assert jnp.all(jnp.isfinite(g)) and jnp.any(g != 0)

    def test_extra_in_variant(self):
        m = cnf.create_nf(
            "SIRENAutodecoder_film_extra_in",
            in_coord_features=3, in_latent_features=8, out_features=2,
            num_hidden_layers=2, hidden_features=16)
        params = m.init_params(jax.random.key(0))
        out = m(params, (jnp.zeros((10, 2)), jnp.float32(0.5)), jnp.zeros((1, 8)))
        assert out.shape == (10, 2)


class TestTorchParity:
    """Golden-value gate: our apply must reproduce the reference torch forward
    bit-for-bit (modulo f32 roundoff) when loaded with the same weights."""

    @pytest.fixture(scope="class")
    def torch_model_and_params(self):
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "/root/reference")
        from ConditionalNeuralField.cnf.nf_networks import SIRENAutodecoder_film

        tm = SIRENAutodecoder_film(2, 16, 3, 4, 32)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        from confild_tpu.io.torch_port import siren_film_params_from_state_dict
        params = siren_film_params_from_state_dict(sd)
        return tm, params

    def test_forward_parity_f64(self, torch_model_and_params):
        """Exact math parity in float64 (f32 differs only by w0-amplified
        roundoff from op-ordering, checked separately)."""
        import torch
        tm, params = torch_model_and_params
        tm64 = tm.double()
        rng = np.random.default_rng(0)
        coords = rng.uniform(-1, 1, size=(64, 2))
        latents = rng.normal(size=(1, 16))
        with torch.no_grad():
            ref = tm64(torch.from_numpy(coords), torch.from_numpy(latents)).numpy()
        with jax.enable_x64(True):
            ours = np.asarray(cnf.siren_film_apply(
                jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params),
                jnp.asarray(coords, jnp.float64), jnp.asarray(latents, jnp.float64)))
        np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)
        tm.float()

    def test_batched_parity_f32(self, torch_model_and_params):
        import torch
        tm, params = torch_model_and_params
        rng = np.random.default_rng(1)
        coords = rng.uniform(-1, 1, size=(5, 40, 2)).astype(np.float32)
        latents = rng.normal(size=(5, 1, 16)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(coords), torch.from_numpy(latents)).numpy()
        ours = np.asarray(cnf.siren_film_apply(
            jax.tree.map(jnp.asarray, params), jnp.asarray(coords), jnp.asarray(latents)))
        # w0=30 amplifies f32 roundoff ~30x per modulated layer; 5e-3 bounds a
        # 5-layer stack while still catching any structural mismatch.
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)


class TestCheckpointRoundtrip:
    def test_pt_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "/root/reference")
        from ConditionalNeuralField.cnf.nf_networks import SIRENAutodecoder_film

        tm = SIRENAutodecoder_film(2, 8, 2, 2, 16)
        latents = torch.nn.Parameter(torch.randn(10, 8))
        path = tmp_path / "checkpoint_5.pt"
        torch.save({
            "epoch": 5,
            "model_state_dict": tm.state_dict(),
            "hidden_states": {"latents": latents.detach()},
        }, path)

        from confild_tpu.io.torch_port import load_cnf_checkpoint
        ck = load_cnf_checkpoint(str(path))
        assert ck["epoch"] == 5
        assert ck["latents"].shape == (10, 8)
        np.testing.assert_allclose(
            ck["params"]["net1"][0]["kernel"],
            tm.state_dict()["net1.0.weight"].numpy().T)
        np.testing.assert_allclose(ck["latents"], latents.detach().numpy())

    def test_normalizer_params_file(self, tmp_path):
        torch = pytest.importorskip("torch")
        path = tmp_path / "normalizer_params.pt"
        torch.save({
            "x_normalizer_params": (torch.tensor([1.0, 1.0]), torch.tensor([0.0, 0.0])),
            "y_normalizer_params": (torch.tensor([2.0]), torch.tensor([-2.0])),
        }, path)
        from confild_tpu.io.torch_port import load_normalizer_params
        p = load_normalizer_params(str(path))
        np.testing.assert_allclose(p["x"][0], [1.0, 1.0])
        np.testing.assert_allclose(p["y"][1], [-2.0])


class TestPublishedCheckpointLayout:
    def test_is_pub_raw_tensor_latents(self, tmp_path):
        """Published Zenodo checkpoints store hidden_states as a raw tensor,
        sometimes with broadcast singleton dims (reference
        inference_function.py:182-212)."""
        torch = pytest.importorskip("torch")
        from confild_tpu.io.torch_port import (latents_from_hidden_states,
                                               load_torch_checkpoint)

        raw = torch.randn(12, 1, 1, 16)
        path = tmp_path / "pub.pt"
        torch.save({"hidden_states": raw}, path)
        ck = load_torch_checkpoint(str(path))
        lat = latents_from_hidden_states(ck["hidden_states"])
        assert lat.shape == (12, 16)
        np.testing.assert_allclose(lat, raw.numpy().reshape(12, 16))

    def test_bf16_storage_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")
        from confild_tpu.io.torch_port import load_torch_checkpoint
        x = torch.randn(8, 4).to(torch.bfloat16)
        path = tmp_path / "bf16.pt"
        torch.save({"w": x}, path)
        out = load_torch_checkpoint(str(path))
        np.testing.assert_allclose(out["w"], x.float().numpy())

    def test_noncontiguous_tensor(self, tmp_path):
        torch = pytest.importorskip("torch")
        from confild_tpu.io.torch_port import load_torch_checkpoint
        x = torch.randn(6, 8).t()  # transposed view: non-trivial strides
        path = tmp_path / "stride.pt"
        torch.save({"w": x}, path)
        out = load_torch_checkpoint(str(path))
        np.testing.assert_allclose(out["w"], x.numpy())
