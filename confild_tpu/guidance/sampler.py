"""Guided (DPS) sampling loops.

The reference's guided ``p_sample_loop`` (``ConditionalDiffusionGeneration/
src/guided_diffusion/gaussian_diffusion.py:169-206``) runs 1000 Python-level
steps, each building a fresh autograd graph through the UNet forward and the
CNF decode, then detaching.  Because the graph is per-step only, the whole
guided sampler maps onto ONE ``lax.scan`` whose body contains a
``jax.value_and_grad`` through (p_sample -> pred_xstart -> operator) — a
single fused XLA program for the entire trajectory.

Registry names match ``create_sampler`` (``gaussian_diffusion.py:30-52``):
``ddpm`` (ancestral) and ``ddim``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from confild_tpu.core import schedules as sched
from confild_tpu.diffusion.gaussian import (GaussianDiffusion, LossType,
                                            MEAN_PROCESSORS, VAR_PROCESSORS)

__SAMPLER__: dict[str, Any] = {}


def register_sampler(name: str):
    def wrapper(cls):
        if name in __SAMPLER__:
            raise NameError(f"Name {name} is already registered!")
        __SAMPLER__[name] = cls
        return cls
    return wrapper


def create_sampler(sampler: str = "ddpm",
                   steps: int = 1000,
                   noise_schedule: str = "cosine",
                   model_mean_type: str = "epsilon",
                   model_var_type: str = "fixed_large",
                   dynamic_threshold: bool = False,
                   clip_denoised: bool = True,
                   rescale_timesteps: bool = False,
                   timestep_respacing: str | None = None):
    """Build a guided sampler (reference ``create_sampler`` signature)."""
    schedule = sched.named_schedule(noise_schedule, steps,
                                    timestep_respacing or None)
    diffusion = GaussianDiffusion(
        schedule,
        model_mean_type=MEAN_PROCESSORS[model_mean_type],
        model_var_type=VAR_PROCESSORS[model_var_type],
        loss_type=LossType.MSE,
        rescale_timesteps=rescale_timesteps,
    )
    cls = __SAMPLER__[sampler]
    return cls(diffusion=diffusion, clip_denoised=clip_denoised,
               dynamic_threshold=dynamic_threshold)


def dynamic_thresholding(x, percentile: float = 0.95):
    """Imagen-style per-sample dynamic thresholding
    (reference ``src/util/img_utils.py:13-15``-adjacent processors)."""
    s = jnp.quantile(jnp.abs(x).reshape(x.shape[0], -1), percentile, axis=-1)
    s = jnp.maximum(s, 1.0).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.clip(x, -s, s) / s


@dataclasses.dataclass
class GuidedSampler:
    diffusion: GaussianDiffusion
    clip_denoised: bool = True
    dynamic_threshold: bool = False

    def _denoised_fn(self):
        return dynamic_thresholding if self.dynamic_threshold else None

    def _one_step(self, model, img, t, key, measurement, cond_method,
                  noiser=None, step_frac=1.0, mask=None):
        """One guided reverse step.

        The misfit gradient is taken through the SAME traced UNet forward
        that produces the sample (``value_and_grad`` with the p_sample output
        as aux) — one fwd + one bwd per step, where the reference evaluates a
        second autograd graph (``condition_methods.py:28-44``).
        """
        d = self.diffusion
        kwargs = {"mask": mask} if mask is not None else {}

        def value_fn(x_prev):
            out = self._inner_sample(model, x_prev, t, key)
            norm = cond_method.misfit(out["pred_xstart"], measurement,
                                      key=jax.random.fold_in(key, 2), **kwargs)
            return norm, out

        if cond_method.needs_grad:
            (norm, out), grad = jax.value_and_grad(
                value_fn, has_aux=True)(img)
        else:
            norm, out = value_fn(img)
            grad = None

        # all batch entries share the same timestep inside the scan, so index
        # the schedule with t[:1]: broadcasts against any measurement shape
        noisy_measurement = d.q_sample(
            measurement, t[:1],
            jax.random.normal(jax.random.fold_in(key, 1),
                              measurement.shape, measurement.dtype))

        x_t, distance = cond_method.apply_guidance(
            out["sample"], grad, norm,
            noisy_measurement=noisy_measurement, step_frac=step_frac)
        return x_t, distance

    def p_sample_loop(self, model, x_start, measurement, cond_method,
                      key, record: bool = False, mask=None,
                      return_distances: bool = False):
        """Guided reverse trajectory from x_T = ``x_start``
        (reference ``gaussian_diffusion.py:169-206``)."""
        d = self.diffusion
        n = d.num_timesteps
        b = x_start.shape[0]

        def step(img, i):
            t = jnp.full((b,), i, jnp.int32)
            x_t, distance = self._one_step(
                model, img, t, jax.random.fold_in(key, i), measurement,
                cond_method, step_frac=i.astype(jnp.float32) / n, mask=mask)
            return x_t, (distance if distance is not None else jnp.float32(0))

        ts = jnp.arange(n - 1, -1, -1)
        img, distances = jax.lax.scan(step, x_start, ts)
        if return_distances:
            return img, distances
        return img

    # subclasses define the inner (unconditional) reverse step
    def _inner_sample(self, model, x, t, key) -> dict:
        raise NotImplementedError


@register_sampler("ddpm")
@dataclasses.dataclass
class DDPM(GuidedSampler):
    def _inner_sample(self, model, x, t, key):
        return self.diffusion.p_sample(
            model, x, t, key, clip_denoised=self.clip_denoised,
            denoised_fn=self._denoised_fn())


@register_sampler("ddim")
@dataclasses.dataclass
class DDIM(GuidedSampler):
    eta: float = 0.0

    def _inner_sample(self, model, x, t, key):
        return self.diffusion.ddim_sample(
            model, x, t, key, clip_denoised=self.clip_denoised,
            denoised_fn=self._denoised_fn(), eta=self.eta)
