"""Gaussian (DDPM/DDIM) diffusion: training losses and sampling loops.

One implementation serves both the unconditional stage (reference
``UnconditionalDiffusionTraining_and_Generation/src/gaussian_diffusion.py``)
and the guided stage (``ConditionalDiffusionGeneration/src/guided_diffusion/
gaussian_diffusion.py`` + ``posterior_mean_variance.py`` — the reference
duplicates the math between stages; here guidance hooks into the same class).

TPU-native design: all schedule tables live in a frozen
:class:`~confild_tpu.core.schedules.DiffusionSchedule` computed in float64 on
the host (matching the reference's numpy-f64 discipline,
``gaussian_diffusion.py:132-133``); the 1000-step ancestral/DDIM loops are
``lax.scan`` over a jitted step so the whole trajectory is ONE XLA program —
no per-step Python dispatch.  Timestep respacing is folded into the schedule;
the model always receives original-process indices via ``timestep_map``
(the ``_WrappedModel`` contract, ``respace.py:110-128``).
"""

from __future__ import annotations

import enum
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from confild_tpu.core import schedules as sched
from confild_tpu.diffusion.losses import (discretized_gaussian_log_likelihood,
                                          normal_kl)
from confild_tpu.models.nn import mean_flat

ModelFn = Callable[..., jnp.ndarray]  # model(x, t, **kwargs) -> output


class ModelMeanType(enum.Enum):
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class ModelVarType(enum.Enum):
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"

    def is_vb(self) -> bool:
        return self in (LossType.KL, LossType.RESCALED_KL)


def _ext(table, t, x):
    return sched.extract(table, t, x.ndim)


class GaussianDiffusion:
    """Pure-functional diffusion ops over a precomputed schedule.

    The ``model`` passed to every method is a callable ``model(x, t,
    **kwargs)`` receiving *original-process* timesteps (respacing remap is
    applied internally).
    """

    def __init__(self, schedule: sched.DiffusionSchedule,
                 model_mean_type: ModelMeanType = ModelMeanType.EPSILON,
                 model_var_type: ModelVarType = ModelVarType.FIXED_LARGE,
                 loss_type: LossType = LossType.MSE,
                 rescale_timesteps: bool = False):
        self.host_schedule = schedule
        self.s = schedule.to_device()
        self.model_mean_type = model_mean_type
        self.model_var_type = model_var_type
        self.loss_type = loss_type
        self.rescale_timesteps = rescale_timesteps
        self.num_timesteps = schedule.num_timesteps

    # -- timestep plumbing --------------------------------------------------

    def model_t(self, t):
        """Internal index -> what the model sees (map + optional rescale)."""
        mapped = jnp.take(self.s.timestep_map, t)
        if self.rescale_timesteps:
            return mapped.astype(jnp.float32) * (
                1000.0 / self.s.original_num_steps)
        return mapped

    # -- q process ----------------------------------------------------------

    def q_mean_variance(self, x_start, t):
        mean = _ext(self.s.sqrt_alphas_cumprod, t, x_start) * x_start
        variance = _ext(1.0 - self.s.alphas_cumprod, t, x_start)
        log_variance = _ext(self.s.log_one_minus_alphas_cumprod, t, x_start)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        return (_ext(self.s.sqrt_alphas_cumprod, t, x_start) * x_start
                + _ext(self.s.sqrt_one_minus_alphas_cumprod, t, x_start) * noise)

    def q_posterior_mean_variance(self, x_start, x_t, t):
        mean = (_ext(self.s.posterior_mean_coef1, t, x_t) * x_start
                + _ext(self.s.posterior_mean_coef2, t, x_t) * x_t)
        variance = _ext(self.s.posterior_variance, t, x_t)
        log_variance = _ext(self.s.posterior_log_variance_clipped, t, x_t)
        return mean, variance, log_variance

    # -- p process ----------------------------------------------------------

    def p_mean_variance(self, model: ModelFn, x, t, clip_denoised: bool = True,
                        denoised_fn=None, model_kwargs=None) -> dict:
        model_kwargs = model_kwargs or {}
        b, c = x.shape[0], x.shape[1]
        model_output = model(x, self.model_t(t), **model_kwargs)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = jnp.split(model_output, 2, axis=1)
            if self.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _ext(self.s.posterior_log_variance_clipped, t, x)
                max_log = _ext(jnp.log(self.s.betas), t, x)
                frac = (model_var_values + 1) / 2
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        elif self.model_var_type == ModelVarType.FIXED_LARGE:
            model_variance = _ext(self.s.fixed_large_variance, t, x)
            model_log_variance = _ext(self.s.fixed_large_log_variance, t, x)
        else:  # FIXED_SMALL
            model_variance = _ext(self.s.posterior_variance, t, x)
            model_log_variance = _ext(self.s.posterior_log_variance_clipped, t, x)

        def process_xstart(xs):
            if denoised_fn is not None:
                xs = denoised_fn(xs)
            if clip_denoised:
                # clamp participates in DPS differentiation: zero gradient
                # outside [-1, 1], exactly like torch clamp
                xs = jnp.clip(xs, -1.0, 1.0)
            return xs

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(
                self._predict_xstart_from_xprev(x, t, model_output))
            model_mean = model_output
        else:
            if self.model_mean_type == ModelMeanType.START_X:
                pred_xstart = process_xstart(model_output)
            else:  # EPSILON
                pred_xstart = process_xstart(
                    self._predict_xstart_from_eps(x, t, model_output))
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    def _predict_xstart_from_eps(self, x_t, t, eps):
        return (_ext(self.s.sqrt_recip_alphas_cumprod, t, x_t) * x_t
                - _ext(self.s.sqrt_recipm1_alphas_cumprod, t, x_t) * eps)

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        return (_ext(1.0 / self.s.posterior_mean_coef1, t, x_t) * xprev
                - _ext(self.s.posterior_mean_coef2 / self.s.posterior_mean_coef1,
                       t, x_t) * x_t)

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        return ((_ext(self.s.sqrt_recip_alphas_cumprod, t, x_t) * x_t
                 - pred_xstart)
                / _ext(self.s.sqrt_recipm1_alphas_cumprod, t, x_t))

    # -- classifier guidance (reference gaussian_diffusion.py:356-393) ------

    def condition_mean(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        gradient = cond_fn(x, self.model_t(t), **(model_kwargs or {}))
        return p_mean_var["mean"] + p_mean_var["variance"] * gradient

    def condition_score(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        alpha_bar = _ext(self.s.alphas_cumprod, t, x)
        eps = self._predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(
            x, self.model_t(t), **(model_kwargs or {}))
        out = dict(p_mean_var)
        out["pred_xstart"] = self._predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(
            out["pred_xstart"], x, t)
        return out

    # -- ancestral sampling ---------------------------------------------------

    def p_sample(self, model: ModelFn, x, t, key, clip_denoised=True,
                 denoised_fn=None, cond_fn=None, model_kwargs=None) -> dict:
        out = self.p_mean_variance(model, x, t, clip_denoised, denoised_fn,
                                   model_kwargs)
        noise = jax.random.normal(key, x.shape, x.dtype)
        nonzero_mask = (t != 0).astype(x.dtype).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        if cond_fn is not None:
            out["mean"] = self.condition_mean(cond_fn, out, x, t, model_kwargs)
        sample = out["mean"] + nonzero_mask * jnp.exp(
            0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def p_sample_loop(self, model: ModelFn, shape: Sequence[int], key,
                      noise=None, clip_denoised=True, denoised_fn=None,
                      cond_fn=None, model_kwargs=None,
                      step_hook=None) -> jnp.ndarray:
        """Full ancestral loop as one ``lax.scan``.

        ``step_hook(x_next, aux) -> x_next`` is the seam guided sampling
        (DPS) plugs into — see :mod:`confild_tpu.guidance`.
        """
        noise_key, loop_key = jax.random.split(key)
        img = (jax.random.normal(noise_key, tuple(shape), jnp.float32)
               if noise is None else noise)

        def step(img, i):
            t = jnp.full((shape[0],), i, jnp.int32)
            out = self.p_sample(model, img, t, jax.random.fold_in(loop_key, i),
                                clip_denoised, denoised_fn, cond_fn,
                                model_kwargs)
            nxt = out["sample"]
            if step_hook is not None:
                nxt = step_hook(x_t=nxt, x_prev=img, t=t,
                                pred_xstart=out["pred_xstart"])
            return nxt, None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        img, _ = jax.lax.scan(step, img, ts)
        return img

    # -- DDIM -----------------------------------------------------------------

    def ddim_sample(self, model: ModelFn, x, t, key, clip_denoised=True,
                    denoised_fn=None, cond_fn=None, model_kwargs=None,
                    eta: float = 0.0) -> dict:
        out = self.p_mean_variance(model, x, t, clip_denoised, denoised_fn,
                                   model_kwargs)
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t, model_kwargs)
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar = _ext(self.s.alphas_cumprod, t, x)
        alpha_bar_prev = _ext(self.s.alphas_cumprod_prev, t, x)
        sigma = (eta * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
                 * jnp.sqrt(1 - alpha_bar / alpha_bar_prev))
        noise = jax.random.normal(key, x.shape, x.dtype)
        mean_pred = (out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
                     + jnp.sqrt(1 - alpha_bar_prev - sigma ** 2) * eps)
        nonzero_mask = (t != 0).astype(x.dtype).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        sample = mean_pred + nonzero_mask * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(self, model: ModelFn, x, t, clip_denoised=True,
                            denoised_fn=None, model_kwargs=None) -> dict:
        """Deterministic reverse ODE step x_t -> x_{t+1}
        (reference ``gaussian_diffusion.py:588-621``)."""
        out = self.p_mean_variance(model, x, t, clip_denoised, denoised_fn,
                                   model_kwargs)
        eps = ((_ext(self.s.sqrt_recip_alphas_cumprod, t, x) * x
                - out["pred_xstart"])
               / _ext(self.s.sqrt_recipm1_alphas_cumprod, t, x))
        alpha_bar_next = _ext(self.s.alphas_cumprod_next, t, x)
        mean_pred = (out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
                     + jnp.sqrt(1 - alpha_bar_next) * eps)
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    def ddim_sample_loop(self, model: ModelFn, shape: Sequence[int], key,
                         noise=None, clip_denoised=True, denoised_fn=None,
                         cond_fn=None, model_kwargs=None, eta: float = 0.0,
                         step_hook=None) -> jnp.ndarray:
        noise_key, loop_key = jax.random.split(key)
        img = (jax.random.normal(noise_key, tuple(shape), jnp.float32)
               if noise is None else noise)

        def step(img, i):
            t = jnp.full((shape[0],), i, jnp.int32)
            out = self.ddim_sample(model, img, t,
                                   jax.random.fold_in(loop_key, i),
                                   clip_denoised, denoised_fn, cond_fn,
                                   model_kwargs, eta)
            nxt = out["sample"]
            if step_hook is not None:
                nxt = step_hook(x_t=nxt, x_prev=img, t=t,
                                pred_xstart=out["pred_xstart"])
            return nxt, None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        img, _ = jax.lax.scan(step, img, ts)
        return img

    # -- training losses ------------------------------------------------------

    def _vb_terms_bpd(self, model: ModelFn, x_start, x_t, t,
                      clip_denoised=True, model_kwargs=None) -> dict:
        true_mean, _, true_log_var = self.q_posterior_mean_variance(
            x_start, x_t, t)
        out = self.p_mean_variance(model, x_t, t, clip_denoised,
                                   model_kwargs=model_kwargs)
        kl = normal_kl(true_mean, true_log_var, out["mean"],
                       out["log_variance"])
        kl = mean_flat(kl) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"])
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(self, model: ModelFn, x_start, t, key,
                        model_kwargs=None, noise=None,
                        valid: bool = False) -> dict:
        """Per-sample losses (reference ``gaussian_diffusion.py:744-821``).

        Under ``jit`` the loss type is static so only the configured branch is
        traced.  ``valid=True`` renames mse->valid_mse like the reference.
        """
        model_kwargs = model_kwargs or {}
        if noise is None:
            noise = jax.random.normal(key, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)

        terms: dict[str, jnp.ndarray] = {}
        mse_name = "mse" if not valid else "valid_mse"

        if self.loss_type.is_vb():
            terms["loss"] = self._vb_terms_bpd(
                model, x_start, x_t, t, model_kwargs=model_kwargs)["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        model_output = model(x_t, self.model_t(t), **model_kwargs)

        if self.model_var_type in (ModelVarType.LEARNED,
                                   ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = jnp.split(model_output, 2, axis=1)
            # VLB for the variance with frozen mean (stop-gradient on the
            # mean half, reference's frozen_out trick :784-800)
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=1)
            terms["vb"] = self._vb_terms_bpd(
                lambda *a, **k: frozen, x_start, x_t, t,
                model_kwargs=model_kwargs)["output"]
            if self.loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * self.num_timesteps / 1000.0

        target = {
            ModelMeanType.PREVIOUS_X: self.q_posterior_mean_variance(
                x_start, x_t, t)[0],
            ModelMeanType.START_X: x_start,
            ModelMeanType.EPSILON: noise,
        }[self.model_mean_type]
        terms[mse_name] = mean_flat((target - model_output) ** 2)
        if "vb" in terms:
            terms["loss"] = terms[mse_name] + terms["vb"]
        else:
            terms["loss"] = terms[mse_name]
        return terms

    def _prior_bpd(self, x_start):
        t = jnp.full((x_start.shape[0],), self.num_timesteps - 1, jnp.int32)
        qt_mean, _, qt_log_variance = self.q_mean_variance(x_start, t)
        kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
        return mean_flat(kl_prior) / np.log(2.0)

    def calc_bpd_loop(self, model: ModelFn, x_start, key,
                      clip_denoised=True, model_kwargs=None) -> dict:
        """Full-bpd evaluation over all timesteps via scan
        (reference ``gaussian_diffusion.py:841-896``)."""
        b = x_start.shape[0]

        def step(carry, i):
            t = jnp.full((b,), i, jnp.int32)
            noise = jax.random.normal(jax.random.fold_in(key, i),
                                      x_start.shape, x_start.dtype)
            x_t = self.q_sample(x_start, t, noise)
            out = self._vb_terms_bpd(model, x_start, x_t, t, clip_denoised,
                                     model_kwargs)
            eps = self._predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            return carry, (out["output"],
                           mean_flat((out["pred_xstart"] - x_start) ** 2),
                           mean_flat((eps - noise) ** 2))

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        _, (vb, xstart_mse, eps_mse) = jax.lax.scan(step, None, ts)
        vb = vb.T  # (B, T) ordered t desc -> reference returns per-t arrays
        total_bpd = vb.sum(axis=1) + self._prior_bpd(x_start)
        return {"total_bpd": total_bpd, "prior_bpd": self._prior_bpd(x_start),
                "vb": vb, "xstart_mse": xstart_mse.T, "mse": eps_mse.T}


# ---------------------------------------------------------------------------
# factory mirroring reference create_gaussian_diffusion (script_util.py:388-426)
# ---------------------------------------------------------------------------

def create_gaussian_diffusion(
    *,
    steps: int = 1000,
    learn_sigma: bool = False,
    sigma_small: bool = False,
    noise_schedule: str = "linear",
    use_kl: bool = False,
    predict_xstart: bool = False,
    rescale_timesteps: bool = False,
    rescale_learned_sigmas: bool = False,
    timestep_respacing: str | Sequence[int] | None = None,
) -> GaussianDiffusion:
    schedule = sched.named_schedule(noise_schedule, steps, timestep_respacing)
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    if not learn_sigma:
        var_type = (ModelVarType.FIXED_SMALL if sigma_small
                    else ModelVarType.FIXED_LARGE)
    else:
        var_type = ModelVarType.LEARNED_RANGE
    return GaussianDiffusion(
        schedule,
        model_mean_type=(ModelMeanType.EPSILON if not predict_xstart
                         else ModelMeanType.START_X),
        model_var_type=var_type,
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
    )


# string registries kept for the guided-stage API surface
# (reference posterior_mean_variance.py:24-44,145-160 registry names)
MEAN_PROCESSORS = {
    "previous_x": ModelMeanType.PREVIOUS_X,
    "start_x": ModelMeanType.START_X,
    "epsilon": ModelMeanType.EPSILON,
}
VAR_PROCESSORS = {
    "learned": ModelVarType.LEARNED,
    "fixed_small": ModelVarType.FIXED_SMALL,
    "fixed_large": ModelVarType.FIXED_LARGE,
    "learned_range": ModelVarType.LEARNED_RANGE,
}
