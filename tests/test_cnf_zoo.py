import jax
import jax.numpy as jnp
import numpy as np
import pytest

from confild_tpu.models import cnf
from confild_tpu.models import cnf_zoo  # noqa: F401 - registers the zoo


COMMON = dict(in_coord_features=2, in_latent_features=8, out_features=3,
              num_hidden_layers=2, hidden_features=16)
AE_COMMON = dict(hyper_in_features=5, hyper_latent_features=8,
                 hyper_num_hidden_layers=1, hyper_hidden_features=16,
                 nf_in_features=2, out_features=3, nf_num_hidden_layers=2,
                 nf_hidden_features=16)


class TestZooShapes:
    coords = None
    latents = None

    def _io(self):
        coords = jax.random.uniform(jax.random.key(1), (4, 30, 2))
        latents = jax.random.normal(jax.random.key(2), (4, 1, 8)) * 0.1
        return coords, latents

    @pytest.mark.parametrize("name", [
        "SIRENAutodecoder_film", "SIREN_rez_Autodecoder_film",
        "SIRENAutodecoder_tw_film", "FNAutodecoder_film",
        "GNAutodecoder_film", "SIRENAutodecoder_mdf_film",
    ])
    def test_film_style_variants(self, name):
        m = cnf.create_nf(name, **COMMON)
        params = m.init_params(jax.random.key(0))
        coords, latents = self._io()
        out = m(params, coords, latents)
        assert out.shape == (4, 30, 3)
        assert jnp.all(jnp.isfinite(out))
        # latent-dependence
        out2 = m(params, coords, latents + 1.0)
        assert not jnp.allclose(out, out2)

    def test_film_single_no_latents(self):
        m = cnf.create_nf("SIRENAutodecoder_film_single",
                          in_coord_features=2, out_features=3,
                          num_hidden_layers=2, hidden_features=16)
        params = m.init_params(jax.random.key(0))
        coords, _ = self._io()
        out = m.apply(params, coords)
        assert out.shape == (4, 30, 3)

    def test_fp_variant(self):
        m = cnf.create_nf("SIRENAutodecoder_fp",
                          hyper_latent_features=8, nf_in_features=2,
                          out_features=3, nf_num_hidden_layers=2,
                          nf_hidden_features=16)
        params = m.init_params(jax.random.key(0))
        coords, latents = self._io()
        out = m(params, coords, latents)
        assert out.shape == (4, 30, 3)
        assert jnp.all(jnp.isfinite(out))

    def test_autoencoder_film(self):
        m = cnf.create_nf("SIRENAutoencoder_film", **AE_COMMON)
        params = m.init_params(jax.random.key(0))
        coords = jax.random.uniform(jax.random.key(1), (4, 30, 2))
        priors = jax.random.normal(jax.random.key(2), (4, 1, 5))
        out, latents = m(params, coords, priors)
        assert out.shape == (4, 30, 3)
        assert latents.shape == (4, 1, 8)

    def test_autoencoder_fp(self):
        m = cnf.create_nf("SIRENAutoencoder_fp", **AE_COMMON)
        params = m.init_params(jax.random.key(0))
        coords = jax.random.uniform(jax.random.key(1), (2, 10, 2))
        priors = jax.random.normal(jax.random.key(2), (2, 1, 5))
        out, latent, pvec = m(params, coords, priors)
        assert out.shape == (2, 10, 3)
        assert latent.shape == (2, 1, 8)

    def test_registry_complete(self):
        """Every reference nf_networks architecture name resolves."""
        expected = [
            "SIRENAutodecoder_film", "SIRENAutodecoder_film_extra_in",
            "SIRENAutodecoder_film_single", "SIREN_rez_Autodecoder_film",
            "SIRENAutodecoder_tw_film", "FNAutodecoder_film",
            "GNAutodecoder_film", "SIRENAutodecoder_fp",
            "SIRENAutodecoder_mdf_film", "SIRENAutoencoder_film",
            "SIRENAutoencoder_fp",
        ]
        for name in expected:
            assert name in cnf.NF_REGISTRY, name


class TestZooTorchParity:
    def test_rez_film_parity(self):
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "/root/reference")
        from ConditionalNeuralField.cnf.nf_networks import (
            SIREN_rez_Autodecoder_film)

        tm = SIREN_rez_Autodecoder_film(2, 8, 3, 2, 16,
                                        num_hidden_layers_rez=2).double()
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        from confild_tpu.io.torch_port import siren_film_params_from_state_dict
        params = siren_film_params_from_state_dict(sd)

        rng = np.random.default_rng(0)
        coords = rng.uniform(-1, 1, size=(20, 2))
        latents = rng.normal(size=(1, 8))
        with torch.no_grad():
            ref = tm(torch.from_numpy(coords), torch.from_numpy(latents)).numpy()
        with jax.enable_x64(True):
            ours = cnf_zoo.siren_rez_apply(
                jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params),
                jnp.asarray(coords), jnp.asarray(latents),
                num_hidden_blocks=2, num_hidden_layers_rez=2)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-10,
                                   atol=1e-12)

    def test_fn_film_parity(self):
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "/root/reference")
        from ConditionalNeuralField.cnf.nf_networks import FNAutodecoder_film

        tm = FNAutodecoder_film(2, 8, 3, 2, 16).double()
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        # hand-map: net1/net2 Linear (out,in)->T; filters .linear
        params = {
            "net1": [{"kernel": sd[f"net1.{i}.weight"].T,
                      "bias": sd[f"net1.{i}.bias"]} for i in range(3)],
            "net2": [{"kernel": sd[f"net2.{i}.weight"].T} for i in range(3)],
            "filters": [{"kernel": sd[f"filters.{i}.linear.weight"].T,
                         "bias": sd[f"filters.{i}.linear.bias"]}
                        for i in range(3)],
        }
        cfg = cnf_zoo.MFNFilmConfig(2, 8, 3, 2, 16, filter_type="fourier")

        rng = np.random.default_rng(1)
        coords = rng.uniform(-1, 1, size=(20, 2))
        latents = rng.normal(size=(1, 8))
        with torch.no_grad():
            ref = tm(torch.from_numpy(coords), torch.from_numpy(latents)).numpy()
        with jax.enable_x64(True):
            ours = cnf_zoo.mfn_film_apply(
                jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params),
                jnp.asarray(coords), jnp.asarray(latents), cfg=cfg)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-10,
                                   atol=1e-12)
