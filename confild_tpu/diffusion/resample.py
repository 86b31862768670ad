"""Timestep schedule samplers (reference ``src/resample.py``).

Functional re-design: sampler state is an explicit pytree updated inside the
jitted train step, so every data-parallel replica holds identical state by
construction — the reference needs an explicit ``all_gather`` of per-rank
(t, loss) pairs to achieve the same determinism (``resample.py:83-121``);
under ``jit`` + sharded batch the update already sees the global batch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UniformSampler:
    num_timesteps: int

    def init_state(self):
        return ()

    def sample(self, state, key, batch_size: int):
        """Returns (t, weights, state)."""
        t = jax.random.randint(key, (batch_size,), 0, self.num_timesteps)
        weights = jnp.ones((batch_size,), jnp.float32)
        return t, weights, state

    def update(self, state, t, losses):
        return state


@dataclasses.dataclass(frozen=True)
class LossSecondMomentResampler:
    """Importance-sample t with p ∝ sqrt(E[loss^2]) once every t has
    ``history_per_term`` recorded losses, mixing in ``uniform_prob`` uniform
    mass (reference ``resample.py:124-154``)."""

    num_timesteps: int
    history_per_term: int = 10
    uniform_prob: float = 0.001

    def init_state(self):
        return {
            "history": jnp.zeros((self.num_timesteps, self.history_per_term),
                                 jnp.float32),
            "counts": jnp.zeros((self.num_timesteps,), jnp.int32),
        }

    def _warmed_up(self, state):
        return jnp.all(state["counts"] == self.history_per_term)

    def _weights(self, state):
        warm = self._warmed_up(state)
        w = jnp.sqrt(jnp.mean(state["history"] ** 2, axis=-1))
        w = w / jnp.maximum(w.sum(), 1e-20)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        uniform = jnp.full((self.num_timesteps,), 1.0 / self.num_timesteps)
        return jnp.where(warm, w, uniform)

    def sample(self, state, key, batch_size: int):
        p = self._weights(state)
        t = jax.random.choice(key, self.num_timesteps, (batch_size,), p=p)
        weights = 1.0 / (self.num_timesteps * p[t])
        return t, weights, state

    def update(self, state, t, losses):
        """Record per-sample losses into the ring history for their t."""
        def body(state, pair):
            ti, loss = pair
            count = state["counts"][ti]
            slot = jnp.where(count == self.history_per_term,
                             self.history_per_term - 1, count)
            # FIFO shift when full, matching reference :139-144
            hist_t = state["history"][ti]
            shifted = jnp.where(count == self.history_per_term,
                                jnp.roll(hist_t, -1).at[-1].set(loss),
                                hist_t.at[slot].set(loss))
            history = state["history"].at[ti].set(shifted)
            counts = state["counts"].at[ti].set(
                jnp.minimum(count + 1, self.history_per_term))
            return {"history": history, "counts": counts}, None

        state, _ = jax.lax.scan(body, state, (t, losses))
        return state


def create_named_schedule_sampler(name: str, num_timesteps: int):
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
