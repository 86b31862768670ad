import jax
import jax.numpy as jnp
import numpy as np
import pytest

from confild_tpu.diffusion import (GaussianDiffusion, LossType, ModelMeanType,
                                   ModelVarType, create_gaussian_diffusion)
from confild_tpu.diffusion import resample
from confild_tpu.core import schedules as sched


def dummy_model(x, t, **kw):
    """Deterministic stand-in UNet with t-dependence."""
    tt = t.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
    return 0.1 * x + 0.001 * jnp.sin(tt)


class TestQProcess:
    def test_q_sample_snr(self):
        d = create_gaussian_diffusion(steps=100, noise_schedule="cosine")
        x0 = jnp.ones((4, 1, 8, 8))
        noise = jax.random.normal(jax.random.key(0), x0.shape)
        # at t=0, signal nearly intact; at t=99, mostly noise
        x_early = d.q_sample(x0, jnp.zeros((4,), jnp.int32), noise)
        x_late = d.q_sample(x0, jnp.full((4,), 99, jnp.int32), noise)
        assert jnp.abs(x_early - x0).mean() < 0.2
        assert jnp.abs(x_late - noise).mean() < 0.25

    def test_posterior_mean_at_t0(self):
        d = create_gaussian_diffusion(steps=100)
        x = jax.random.normal(jax.random.key(0), (2, 1, 4, 4))
        mean, _, _ = d.q_posterior_mean_variance(x, x, jnp.zeros((2,), jnp.int32))
        np.testing.assert_allclose(np.asarray(mean), np.asarray(x), rtol=1e-5)


class TestSampling:
    def test_p_sample_loop_shape_and_finite(self):
        d = create_gaussian_diffusion(steps=10, noise_schedule="cosine")
        out = d.p_sample_loop(dummy_model, (2, 1, 8, 8), jax.random.key(0))
        assert out.shape == (2, 1, 8, 8)
        assert jnp.all(jnp.isfinite(out))

    def test_ddim_eta0_deterministic(self):
        d = create_gaussian_diffusion(steps=50, noise_schedule="cosine")
        noise = jax.random.normal(jax.random.key(1), (1, 1, 8, 8))
        a = d.ddim_sample_loop(dummy_model, (1, 1, 8, 8), jax.random.key(2),
                               noise=noise, eta=0.0)
        b = d.ddim_sample_loop(dummy_model, (1, 1, 8, 8), jax.random.key(3),
                               noise=noise, eta=0.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_respaced_ddim_matches_step_count(self):
        d = create_gaussian_diffusion(steps=1000, noise_schedule="cosine",
                                      timestep_respacing="ddim10")
        assert d.num_timesteps == 10
        out = d.ddim_sample_loop(dummy_model, (1, 1, 8, 8), jax.random.key(0))
        assert jnp.all(jnp.isfinite(out))

    def test_clip_denoised_bounds_pred_xstart(self):
        d = create_gaussian_diffusion(steps=100)
        x = 50 * jax.random.normal(jax.random.key(0), (2, 1, 4, 4))
        out = d.p_mean_variance(dummy_model, x, jnp.full((2,), 5, jnp.int32),
                                clip_denoised=True)
        assert jnp.all(jnp.abs(out["pred_xstart"]) <= 1.0)


class TestTrainingLosses:
    def test_mse_loss_value(self):
        d = create_gaussian_diffusion(steps=100, noise_schedule="cosine")
        x0 = jax.random.normal(jax.random.key(0), (4, 1, 8, 8))
        t = jnp.array([0, 10, 50, 99])
        terms = d.training_losses(dummy_model, x0, t, jax.random.key(1))
        assert terms["loss"].shape == (4,)
        assert jnp.all(terms["loss"] > 0)
        assert "mse" in terms

    def test_valid_renames(self):
        d = create_gaussian_diffusion(steps=100)
        x0 = jnp.zeros((2, 1, 4, 4))
        terms = d.training_losses(dummy_model, x0, jnp.array([1, 2]),
                                  jax.random.key(0), valid=True)
        assert "valid_mse" in terms

    def test_learned_range_vb_term(self):
        d = create_gaussian_diffusion(steps=100, learn_sigma=True,
                                      rescale_learned_sigmas=True)

        def model2(x, t, **kw):
            return jnp.concatenate([dummy_model(x, t), jnp.zeros_like(x)], axis=1)

        x0 = jax.random.normal(jax.random.key(0), (2, 1, 8, 8))
        terms = d.training_losses(model2, x0, jnp.array([5, 50]),
                                  jax.random.key(1))
        assert "vb" in terms and jnp.all(jnp.isfinite(terms["vb"]))


class TestResamplers:
    def test_uniform(self):
        s = resample.UniformSampler(100)
        t, w, _ = s.sample((), jax.random.key(0), 64)
        assert t.shape == (64,) and jnp.all((t >= 0) & (t < 100))
        np.testing.assert_allclose(np.asarray(w), 1.0)

    def test_loss_aware_warmup_uniform(self):
        s = resample.LossSecondMomentResampler(10, history_per_term=2)
        state = s.init_state()
        t, w, _ = s.sample(state, jax.random.key(0), 32)
        np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-5)

    def test_loss_aware_warmed_up_reweights(self):
        s = resample.LossSecondMomentResampler(4, history_per_term=2)
        state = s.init_state()
        # fill history: t=0 has huge loss, others tiny
        for _ in range(2):
            t = jnp.arange(4)
            losses = jnp.array([10.0, 0.1, 0.1, 0.1])
            state = s.update(state, t, losses)
        t, w, _ = s.sample(state, jax.random.key(1), 512)
        frac0 = float(jnp.mean(t == 0))
        assert frac0 > 0.5  # high-loss timestep dominates
        # importance weights compensate: weight of t=0 < 1
        assert float(w[jnp.argmax(t == 0)]) < 1.0


class TestTorchParity:
    @pytest.fixture(scope="class")
    def torch_env(self):
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "/root/reference/UnconditionalDiffusionTraining_and_Generation")
        from src.script_util import create_gaussian_diffusion as ref_create
        return torch, ref_create

    def _pair(self, torch_env, **kw):
        torch, ref_create = torch_env
        ref = ref_create(steps=100, noise_schedule="cosine", **kw)
        ours = create_gaussian_diffusion(steps=100, noise_schedule="cosine",
                                         **kw)
        return torch, ref, ours

    def test_schedule_tables(self, torch_env):
        _, ref, ours = self._pair(torch_env)
        for name in ["betas", "alphas_cumprod", "posterior_variance",
                     "posterior_mean_coef1", "posterior_mean_coef2",
                     "posterior_log_variance_clipped"]:
            np.testing.assert_allclose(getattr(ours.host_schedule, name),
                                       getattr(ref, name), rtol=1e-12)

    def test_q_sample_parity(self, torch_env):
        torch, ref, ours = self._pair(torch_env)
        rng = np.random.default_rng(0)
        x0 = rng.normal(size=(3, 1, 8, 8)).astype(np.float32)
        noise = rng.normal(size=(3, 1, 8, 8)).astype(np.float32)
        t = np.array([0, 42, 99])
        r = ref.q_sample(torch.from_numpy(x0), torch.from_numpy(t),
                         torch.from_numpy(noise)).numpy()
        o = np.asarray(ours.q_sample(jnp.asarray(x0), jnp.asarray(t),
                                     jnp.asarray(noise)))
        np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-6)

    def test_p_mean_variance_parity(self, torch_env):
        torch, ref, ours = self._pair(torch_env)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
        t = np.array([7, 90])

        def tmodel(x, t, **kw):
            tt = t.float().reshape(-1, 1, 1, 1)
            return 0.1 * x + 0.001 * torch.sin(tt)

        r = ref.p_mean_variance(tmodel, torch.from_numpy(x),
                                torch.from_numpy(t), clip_denoised=True)
        o = ours.p_mean_variance(dummy_model, jnp.asarray(x), jnp.asarray(t),
                                 clip_denoised=True)
        for key in ["mean", "variance", "log_variance", "pred_xstart"]:
            # our fixed-variance tables stay in broadcast form (B,1,1,1)
            ours_full = np.broadcast_to(np.asarray(o[key]), r[key].shape)
            np.testing.assert_allclose(ours_full, r[key].numpy(),
                                       rtol=1e-4, atol=1e-5, err_msg=key)

    def test_training_losses_parity(self, torch_env):
        torch, ref, ours = self._pair(torch_env)
        rng = np.random.default_rng(2)
        x0 = rng.normal(size=(4, 1, 8, 8)).astype(np.float32)
        noise = rng.normal(size=(4, 1, 8, 8)).astype(np.float32)
        t = np.array([0, 10, 55, 99])

        def tmodel(x, t, **kw):
            tt = t.float().reshape(-1, 1, 1, 1)
            return 0.1 * x + 0.001 * torch.sin(tt)

        r = ref.training_losses(tmodel, torch.from_numpy(x0),
                                torch.from_numpy(t),
                                noise=torch.from_numpy(noise))
        o = ours.training_losses(dummy_model, jnp.asarray(x0), jnp.asarray(t),
                                 jax.random.key(0), noise=jnp.asarray(noise))
        np.testing.assert_allclose(np.asarray(o["loss"]), r["loss"].numpy(),
                                   rtol=1e-4, atol=1e-6)

    def test_respaced_parity(self, torch_env):
        torch, ref_create = torch_env
        ref = ref_create(steps=100, noise_schedule="cosine",
                         timestep_respacing="ddim10")
        ours = create_gaussian_diffusion(steps=100, noise_schedule="cosine",
                                         timestep_respacing="ddim10")
        np.testing.assert_allclose(ours.host_schedule.betas, ref.betas,
                                   rtol=1e-12)
        np.testing.assert_allclose(ours.host_schedule.timestep_map,
                                   ref.timestep_map)


class TestReverseOdeAndBpd:
    def test_ddim_reverse_roundtrip(self):
        """Reverse ODE x_t -> x_{t+1} inverts the eta=0 DDIM step for a
        smooth model (reference gaussian_diffusion.py:588-621)."""
        d = create_gaussian_diffusion(steps=50, noise_schedule="cosine")
        x = 0.3 * jax.random.normal(jax.random.key(0), (2, 1, 8, 8))
        t = jnp.array([20, 20])
        fwd = d.ddim_reverse_sample(dummy_model, x, t,
                                    clip_denoised=False)["sample"]
        back = d.ddim_sample(dummy_model, fwd, t + 1, jax.random.key(1),
                             clip_denoised=False, eta=0.0)["sample"]
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   atol=5e-3)

    def test_calc_bpd_loop_consistency(self):
        """total_bpd = sum of per-t vb terms + prior bpd, all finite
        (reference gaussian_diffusion.py:841-896)."""
        d = create_gaussian_diffusion(steps=8, noise_schedule="cosine")
        x = jnp.tanh(jax.random.normal(jax.random.key(0), (2, 1, 8, 8)))
        out = d.calc_bpd_loop(dummy_model, x, jax.random.key(1))
        assert out["vb"].shape == (2, 8)
        assert out["mse"].shape == (2, 8)
        for v in out.values():
            assert np.all(np.isfinite(np.asarray(v)))
        np.testing.assert_allclose(
            np.asarray(out["total_bpd"]),
            np.asarray(out["vb"].sum(axis=1) + out["prior_bpd"]), rtol=1e-6)
