import jax
import jax.numpy as jnp
import numpy as np
import pytest

from confild_tpu.guidance import (create_sampler, get_conditioning_method,
                                  get_noise, get_operator)
from confild_tpu.guidance.operators import CNFDecodeOperator
from confild_tpu.core import normalize as cnorm
from confild_tpu.models import cnf


def make_oracle_model(diffusion, x0_true, gamma: float = 1.0):
    """Epsilon-predictor for a single-image dataset.  gamma=1 is the exact
    oracle (pred_xstart == x0_true exactly, independent of x — which gives a
    ZERO DPS gradient); gamma<1 leaks x-dependence into pred_xstart so
    guidance has something to push on."""
    s = diffusion.s

    def model(x, t_mapped, **kw):
        t = t_mapped  # original-process index -> internal schedule position
        ab = jnp.take(s.alphas_cumprod, jnp.searchsorted(s.timestep_map, t))
        ab = ab.reshape((-1,) + (1,) * (x.ndim - 1))
        return gamma * (x - jnp.sqrt(ab) * x0_true) / jnp.sqrt(1 - ab)

    return model


class TestInpaintingDPS:
    def test_guided_moves_toward_measurement(self):
        sampler = create_sampler("ddpm", steps=50, noise_schedule="cosine")
        d = sampler.diffusion
        key = jax.random.key(0)
        shape = (1, 1, 8, 8)

        x0_a = jnp.ones(shape) * 0.5          # model's preferred image
        x0_b = -jnp.ones(shape) * 0.5         # measurement source
        model = make_oracle_model(d, x0_a, gamma=0.85)

        mask = jnp.zeros(shape).at[:, :, :4, :].set(1.0)
        operator = get_operator("inpainting", mask=mask)
        noiser = get_noise("gaussian", sigma=0.0)
        y = operator.forward(x0_b)

        method = get_conditioning_method("ps", operator, noiser, scale=30.0)
        x_start = jax.random.normal(key, shape)
        out, dist = sampler.p_sample_loop(model, x_start, y, method,
                                          jax.random.key(1),
                                          return_distances=True)
        assert out.shape == shape
        assert jnp.all(jnp.isfinite(out))
        # misfit must shrink over the trajectory
        assert float(dist[-1]) < float(dist[0])
        # masked region pulled toward x0_b, unmasked stays near x0_a
        masked_err_b = jnp.abs(out[:, :, :4, :] - x0_b[:, :, :4, :]).mean()
        masked_err_a = jnp.abs(out[:, :, :4, :] - x0_a[:, :, :4, :]).mean()
        assert float(masked_err_b) < float(masked_err_a)

    def test_vanilla_is_unconditional(self):
        sampler = create_sampler("ddim", steps=20, noise_schedule="cosine")
        d = sampler.diffusion
        x0 = jnp.full((1, 1, 4, 4), 0.3)
        model = make_oracle_model(d, x0)
        operator = get_operator("inpainting", mask=jnp.ones((1, 1, 4, 4)))
        method = get_conditioning_method("vanilla", operator,
                                         get_noise("clean"))
        out = sampler.p_sample_loop(model, jax.random.normal(jax.random.key(0),
                                                             (1, 1, 4, 4)),
                                    x0, method, jax.random.key(1))
        # oracle + DDIM eta=0 converges to x0
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.05)


class TestCNFOperator:
    @pytest.fixture()
    def operator(self):
        m = cnf.create_nf("SIRENAutodecoder_film", in_coord_features=2,
                          in_latent_features=8, out_features=2,
                          num_hidden_layers=2, hidden_features=16)
        params = m.init_params(jax.random.key(0))
        coords = np.random.default_rng(0).uniform(size=(50, 2)).astype(np.float32)
        x_norm = cnorm.Normalizer((np.ones(2, np.float32),
                                   np.zeros(2, np.float32)), "-11", 0)
        y_norm = cnorm.Normalizer((np.full((1, 2), 2.0, np.float32),
                                   np.full((1, 2), -2.0, np.float32)), "-11", 0)
        return CNFDecodeOperator(
            params=params, coords=coords, x_normalizer=x_norm,
            y_normalizer=y_norm, max_val=np.float32(3.0),
            min_val=np.float32(-3.0), use_pallas=False)

    def test_forward_shape(self, operator):
        data = jax.random.normal(jax.random.key(1), (2, 1, 4, 8))
        fields = operator.forward(data)
        assert fields.shape == (8, 50, 2)

    def test_forward_differentiable(self, operator):
        data = jax.random.normal(jax.random.key(1), (1, 1, 4, 8)) * 0.1
        y = operator.forward(data * 0.5)

        def loss(d):
            return jnp.sum((operator.forward(d) - y) ** 2)

        g = jax.grad(loss)(data)
        assert g.shape == data.shape
        assert jnp.all(jnp.isfinite(g)) and jnp.any(g != 0)

    def test_dps_through_cnf_decode(self, operator):
        """End-to-end: DPS through the differentiable CNF decode reduces the
        sensor misfit (the reference Case4 structure, notebook cells 20-23)."""
        sampler = create_sampler("ddpm", steps=20, noise_schedule="cosine")
        d = sampler.diffusion

        truth = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 1, 4, 8)))
        y = operator.forward(truth)
        model = make_oracle_model(d, jnp.zeros((1, 1, 4, 8)), gamma=0.7)
        method = get_conditioning_method("ps", operator,
                                         get_noise("gaussian", sigma=0.0),
                                         scale=0.5)
        x_start = jax.random.normal(jax.random.key(3), (1, 1, 4, 8))
        out, dist = sampler.p_sample_loop(model, x_start, y, method,
                                          jax.random.key(4),
                                          return_distances=True)
        assert jnp.all(jnp.isfinite(out))
        assert float(dist[-1]) < float(dist[0])


class TestRegistries:
    def test_all_methods_constructible(self):
        op = get_operator("inpainting", mask=jnp.ones((1, 1, 4, 4)))
        noiser = get_noise("clean")
        for name in ["vanilla", "projection", "mcg", "ps", "ps_linear_decay",
                     "ps+"]:
            m = get_conditioning_method(name, op, noiser)
            assert m is not None

    def test_noise_models(self):
        x = jnp.zeros((2, 3))
        assert jnp.allclose(get_noise("clean").apply(x), x)
        g = get_noise("gaussian", sigma=1.0)
        out = g.apply(x, key=jax.random.key(0))
        assert not jnp.allclose(out, x)

    def test_unknown_raises(self):
        with pytest.raises(NameError):
            get_operator("nope")
        with pytest.raises(NameError):
            get_noise("nope")


class TestCaseOperatorFactories:
    def test_case3_factory_with_native_ckpt(self, tmp_path):
        """case3 registry factory: framework checkpoint + normalizer file,
        y params trimmed to the first 2 channels (reference
        measurements.py:99-137)."""
        from confild_tpu.io.checkpoint import save_pytree
        from confild_tpu.guidance.operators import get_operator

        m = cnf.create_nf("SIRENAutodecoder_film", in_coord_features=2,
                          in_latent_features=256, out_features=2,
                          num_hidden_layers=2, hidden_features=32)
        params = m.init_params(jax.random.key(0))
        ckpt = tmp_path / "checkpoint_1.ckpt"
        save_pytree(str(ckpt), {"model_state_dict": params, "epoch": 1})
        norm_file = tmp_path / "normalizer_params.ckpt"
        save_pytree(str(norm_file), {
            "x_normalizer_params": (np.ones(2, np.float32),
                                    np.zeros(2, np.float32)),
            # 4 channels saved, operator trims to 2
            "y_normalizer_params": (np.ones((1, 4), np.float32),
                                    -np.ones((1, 4), np.float32)),
        })
        coords = np.random.default_rng(0).uniform(size=(20, 2)).astype(np.float32)
        op = get_operator("case3", coords=coords, max_val=np.float32(1.0),
                          min_val=np.float32(-1.0),
                          normalizer_params_path=str(norm_file),
                          ckpt_path=str(ckpt))
        data = jax.random.normal(jax.random.key(1), (1, 1, 4, 256)) * 0.1
        fields = op.forward(data)
        assert fields.shape == (4, 20, 2)
        assert jnp.all(jnp.isfinite(fields))

    def test_case3_gappy_alias(self, tmp_path):
        from confild_tpu.guidance.operators import __OPERATOR__
        assert "case3_gappy" in __OPERATOR__
        assert "case2" in __OPERATOR__ and "case4" in __OPERATOR__


class TestMoreConditioningMethods:
    def _setup(self):
        sampler = create_sampler("ddpm", steps=20, noise_schedule="cosine")
        shape = (1, 1, 8, 8)
        x0_a = jnp.ones(shape) * 0.5
        x0_b = -jnp.ones(shape) * 0.5
        model = make_oracle_model(sampler.diffusion, x0_a, gamma=0.85)
        mask = jnp.ones(shape)
        op = get_operator("inpainting", mask=mask)
        y = op.forward(x0_b)
        return sampler, model, op, y, shape

    def test_ps_plus_reduces_misfit(self):
        sampler, model, op, y, shape = self._setup()
        method = get_conditioning_method("ps+", op, get_noise("clean"),
                                         scale=10.0, num_sampling=3)
        out, dist = sampler.p_sample_loop(
            model, jax.random.normal(jax.random.key(0), shape), y, method,
            jax.random.key(1), return_distances=True)
        assert jnp.all(jnp.isfinite(out))
        assert float(dist[-1]) < float(dist[0])

    def test_mcg_projects_and_guides(self):
        sampler, model, op, y, shape = self._setup()
        method = get_conditioning_method("mcg", op, get_noise("clean"),
                                         scale=5.0)
        out = sampler.p_sample_loop(
            model, jax.random.normal(jax.random.key(0), shape), y, method,
            jax.random.key(1))
        assert jnp.all(jnp.isfinite(out))

    def test_ps_linear_decay_runs(self):
        sampler, model, op, y, shape = self._setup()
        method = get_conditioning_method("ps_linear_decay", op,
                                         get_noise("clean"),
                                         start_scale=20.0, end_scale=1.0)
        out = sampler.p_sample_loop(
            model, jax.random.normal(jax.random.key(0), shape), y, method,
            jax.random.key(1))
        assert jnp.all(jnp.isfinite(out))

    def test_respaced_guided_sampler(self):
        """Guided DDIM with ddim-respacing: model receives original-process
        timesteps via the timestep_map (reference respace contract)."""
        sampler = create_sampler("ddim", steps=1000, noise_schedule="cosine",
                                 timestep_respacing="ddim10")
        assert sampler.diffusion.num_timesteps == 10
        shape = (1, 1, 4, 4)
        x0 = jnp.full(shape, 0.3)
        model = make_oracle_model(sampler.diffusion, x0)
        op = get_operator("inpainting", mask=jnp.ones(shape))
        method = get_conditioning_method("vanilla", op, get_noise("clean"))
        out = sampler.p_sample_loop(
            model, jax.random.normal(jax.random.key(0), shape), x0, method,
            jax.random.key(1))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.05)

    def test_case2_hardcoded_constants(self, tmp_path):
        """case2 factory carries the reference's hard-coded normalizer values
        (measurements.py:70-75)."""
        from confild_tpu.io.checkpoint import save_pytree
        m = cnf.create_nf("SIRENAutodecoder_film", in_coord_features=2,
                          in_latent_features=256, out_features=4,
                          num_hidden_layers=1, hidden_features=16)
        ckpt = tmp_path / "c.ckpt"
        save_pytree(str(ckpt), {"model_state_dict":
                                m.init_params(jax.random.key(0))})
        op = get_operator("case2", ckpt_path=str(ckpt), max_val=np.float32(1),
                          min_val=np.float32(-1),
                          coords=np.zeros((4, 2), np.float32))
        np.testing.assert_allclose(
            np.asarray(op.y_normalizer.params[0]),
            [[0.9617, 0.2666, 0.2869, 0.0290]], rtol=1e-6)
