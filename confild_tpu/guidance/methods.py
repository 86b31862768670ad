"""Conditioning methods for guided diffusion (DPS and friends).

Re-design of the reference registry (``ConditionalDiffusionGeneration/src/
guided_diffusion/condition_methods.py``).  The torch version mutates
``x_t -= scale * autograd.grad(norm, x_prev)``; here each method is a pure
function invoked inside the sampler's ``lax.scan`` body with an
``x0_from_prev`` closure so ``jax.grad`` re-traces the UNet forward + CNF
decode chain exactly like the reference's per-step graph (the reference
detaches between steps, ``gaussian_diffusion.py:198`` — hence one
independent gradient per step, which is precisely a scan body).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

__CONDITIONING_METHOD__: dict[str, Callable[..., Any]] = {}


def register_conditioning_method(name: str):
    def wrapper(cls):
        if name in __CONDITIONING_METHOD__:
            raise NameError(f"Name {name} is already registered!")
        __CONDITIONING_METHOD__[name] = cls
        return cls
    return wrapper


def get_conditioning_method(name: str, operator, noiser, **kwargs):
    if name not in __CONDITIONING_METHOD__:
        raise NameError(f"Name {name} is not defined!")
    return __CONDITIONING_METHOD__[name](operator=operator, noiser=noiser,
                                         **kwargs)


@dataclasses.dataclass
class ConditioningMethod:
    operator: Any
    noiser: Any = None

    # Does the sampler need grad(misfit) wrt x_prev?  False skips the whole
    # backward trace (vanilla/projection).
    needs_grad: bool = dataclasses.field(default=True, init=False)

    def project(self, data, noisy_measurement, **kwargs):
        return self.operator.project(data=data, measurement=noisy_measurement,
                                     **kwargs)

    def misfit(self, x0_hat, measurement, key=None, **kwargs):
        """Differentiable measurement misfit ``||y - A(x0_hat)||_2``
        (reference ``condition_methods.py:28-44``); Poisson noise normalizes
        by |y|.  The sampler differentiates this through ONE traced UNet
        forward (value_and_grad with the sample as aux), where the reference
        re-runs autograd over a second graph."""
        difference = measurement - self.operator.forward(x0_hat, **kwargs)
        nrm = jnp.linalg.norm(difference.reshape(-1))
        if self.noiser is not None and getattr(self.noiser, "name", "") == "poisson":
            nrm = jnp.mean(nrm / jnp.abs(measurement))
        return nrm

    def grad_and_value(self, x_prev, x0_from_prev, measurement, **kwargs):
        """Standalone helper (kept for API parity): gradient of the misfit
        wrt x_prev through an ``x0_from_prev`` closure."""
        def norm_fn(xp):
            return self.misfit(x0_from_prev(xp), measurement, **kwargs)

        norm, grad = jax.value_and_grad(norm_fn)(x_prev)
        return grad, norm

    def apply_guidance(self, x_t, grad, norm, *, noisy_measurement=None,
                       step_frac=1.0, **kwargs):
        """Post-sample update given the misfit gradient; default: identity."""
        return x_t, norm


@register_conditioning_method("vanilla")
class Identity(ConditioningMethod):
    def __post_init__(self):
        self.needs_grad = False

    def apply_guidance(self, x_t, grad, norm, **kwargs):
        return x_t, None


@register_conditioning_method("projection")
class Projection(ConditioningMethod):
    def __post_init__(self):
        self.needs_grad = False

    def apply_guidance(self, x_t, grad, norm, *, noisy_measurement=None,
                       **kwargs):
        return self.project(x_t, noisy_measurement), None


@register_conditioning_method("mcg")
@dataclasses.dataclass
class ManifoldConstraintGradient(ConditioningMethod):
    scale: float = 1.0

    def apply_guidance(self, x_t, grad, norm, *, noisy_measurement=None,
                       **kwargs):
        x_t = x_t - grad * self.scale
        return self.project(x_t, noisy_measurement), norm


@register_conditioning_method("ps")
@dataclasses.dataclass
class PosteriorSampling(ConditioningMethod):
    """DPS: x_t <- x_t - scale * grad_{x_prev} ||y - A(x0_hat)||
    (reference ``condition_methods.py:78-87``)."""

    scale: float = 1.0

    def apply_guidance(self, x_t, grad, norm, **kwargs):
        return x_t - grad * self.scale, norm


@register_conditioning_method("ps_linear_decay")
@dataclasses.dataclass
class PosteriorSamplingLinearDecay(ConditioningMethod):
    """Scale decays linearly from start_scale to end_scale over the reverse
    trajectory (reference ``condition_methods.py:89-108``).  Pure version:
    the current step index arrives via ``step_frac`` in [0, 1] (1 at t=T-1)."""

    scale: float = 1.0
    start_scale: float = 20.0
    end_scale: float = 1.0

    def apply_guidance(self, x_t, grad, norm, *, step_frac=1.0, **kwargs):
        scale = (self.start_scale - self.end_scale) * step_frac + self.end_scale
        return x_t - grad * scale, norm


@register_conditioning_method("ps+")
@dataclasses.dataclass
class PosteriorSamplingPlus(ConditioningMethod):
    """Averaged ensemble of perturbed x0_hat misfits
    (reference ``condition_methods.py:110-127``)."""

    num_sampling: int = 5
    scale: float = 1.0

    def misfit(self, x0_hat, measurement, key=None, **kwargs):
        if key is None:
            key = jax.random.key(0)
        total = 0.0
        for i in range(self.num_sampling):
            # reference uses uniform [0, 1) perturbations (torch.rand_like)
            pert = 0.05 * jax.random.uniform(
                jax.random.fold_in(key, i), x0_hat.shape, x0_hat.dtype)
            diff = measurement - self.operator.forward(x0_hat + pert, **kwargs)
            total = total + jnp.linalg.norm(diff.reshape(-1)) / self.num_sampling
        return total

    def apply_guidance(self, x_t, grad, norm, **kwargs):
        return x_t - grad * self.scale, norm
