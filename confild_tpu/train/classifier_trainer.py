"""Noised-classifier training for classifier guidance.

The reference ships the classifier half of ADM (``EncoderUNetModel``,
``src/unet.py:683-894``) and the guidance hooks (``condition_mean`` /
``condition_score``, ``src/gaussian_diffusion.py:356-393``) but no trainer
for it — upstream guided-diffusion's ``classifier_train.py`` is the missing
piece this module supplies, TPU-first: one jitted step (q_sample -> encoder
forward -> softmax cross-entropy -> AdamW), uniform timestep sampling, data
sharded over the mesh exactly like ``TrainLoop``.

``classifier_cond_fn`` turns the trained weights into the ``cond_fn``
consumed by ``GaussianDiffusion.p_sample_loop`` / ``ddim_sample_loop``:
``scale * grad_x log p(y | x_t, t)`` (upstream ``classifier_sample.py``
semantics).
"""

from __future__ import annotations

import os
from typing import Any, Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from confild_tpu.io import checkpoint as ckpt_io
from confild_tpu.parallel import mesh as pmesh
from confild_tpu.utils import logger as tlog


class ClassifierTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class ClassifierTrainLoop:
    """Train an ``EncoderUNetModel`` to classify *noised* latent images.

    ``data`` yields ``(x, y)`` with ``x`` (B, C, H, W) in [-1, 1] and ``y``
    (B,) int labels.  With ``noised=True`` each batch is diffused to a
    uniformly drawn timestep before classification, so the classifier is
    valid along the whole reverse trajectory (what ``cond_fn`` needs)."""

    def __init__(
        self,
        *,
        model,
        diffusion,
        data: Iterator,
        batch_size: int,
        lr: float = 3e-4,
        weight_decay: float = 0.05,
        lr_anneal_steps: int = 0,
        noised: bool = True,
        log_interval: int = 10,
        save_interval: int = 10000,
        save_dir: str | None = None,
        mesh=None,
        seed: int = 42,
        keep_checkpoints: int = 0,
    ):
        self.model = model
        self.diffusion = diffusion
        self.data = data
        self.batch_size = batch_size
        self.noised = noised
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.lr_anneal_steps = lr_anneal_steps
        self.save_dir = save_dir or (tlog.get_current().dir or ".")
        self.mesh = mesh
        self.keep_checkpoints = keep_checkpoints
        self.rng = jax.random.key(seed)

        if lr_anneal_steps:
            sched = optax.linear_schedule(lr, 0.0, lr_anneal_steps)
        else:
            sched = lr
        self.opt = optax.adamw(sched, weight_decay=weight_decay)

        params = model.init(jax.random.key(seed))
        state = ClassifierTrainState(
            params=jax.tree.map(jnp.asarray, params),
            opt_state=self.opt.init(params),
            step=jnp.asarray(0, jnp.int32),
        )
        if mesh is not None:
            state = pmesh.replicate(state, mesh)
        self.state = state
        self._step_fn = self._build_step()

    def _build_step(self):
        model, diffusion, opt = self.model, self.diffusion, self.opt
        noised = self.noised
        n_t = diffusion.num_timesteps

        def loss_fn(params, x, y, t, noise):
            if noised:
                x = diffusion.q_sample(x, t, noise)
            logits = model.apply(params, x, t)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y)
            acc = (jnp.argmax(logits, -1) == y).astype(jnp.float32)
            return ce.mean(), acc.mean()

        def step(state: ClassifierTrainState, x, y, key):
            kt, kn = jax.random.split(key)
            t = jax.random.randint(kt, (x.shape[0],), 0, n_t)
            noise = jax.random.normal(kn, x.shape, x.dtype)
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, x, y, t, noise)
            updates, opt_state = opt.update(grads, state.opt_state,
                                            state.params)
            params = optax.apply_updates(state.params, updates)
            return ClassifierTrainState(params, opt_state, state.step + 1), \
                {"loss": loss, "acc": acc}

        return jax.jit(step, donate_argnums=(0,))

    def run_step(self, x, y):
        self.rng, key = jax.random.split(self.rng)
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        if self.mesh is not None:
            x = pmesh.shard_batch(x, self.mesh)
            y = pmesh.shard_batch(y, self.mesh)
        self.state, metrics = self._step_fn(self.state, x, y, key)
        return metrics

    def run_loop(self, steps: int | None = None):
        logger = tlog.get_current()
        total = steps if steps is not None else self.lr_anneal_steps
        assert total, "pass steps= or set lr_anneal_steps"
        while int(self.state.step) < total:
            x, y = next(self.data)
            metrics = self.run_step(x, y)
            step = int(self.state.step)
            logger.logkv("step", step)
            logger.logkv_mean("loss", float(metrics["loss"]))
            logger.logkv_mean("acc", float(metrics["acc"]))
            if step % self.log_interval == 0:
                logger.dumpkvs()
            if step % self.save_interval == 0 and step >= self.save_interval:
                self.save()
        self.save()
        return self.state

    def save(self):
        step = int(self.state.step)
        os.makedirs(self.save_dir, exist_ok=True)
        ckpt_io.save_pytree(
            os.path.join(self.save_dir, f"model{step:06d}.ckpt"),
            self.state.params)
        ckpt_io.save_pytree(
            os.path.join(self.save_dir, f"opt{step:06d}.ckpt"),
            self.state.opt_state)
        if self.keep_checkpoints:
            ckpt_io.rotate_checkpoints(self.save_dir, self.keep_checkpoints,
                                       kind="diffusion")
        tlog.log(f"saved classifier checkpoint at step {step}")


def classifier_cond_fn(model, params, scale: float = 1.0):
    """``cond_fn(x, t, y=...) -> scale * grad_x log p(y | x_t, t)`` for
    ``GaussianDiffusion.condition_mean`` / ``condition_score`` (upstream
    ``classifier_sample.py``; hooks at ``src/gaussian_diffusion.py:356-393``).
    """

    def cond_fn(x, t, y=None, **kwargs):
        assert y is not None, "classifier guidance needs labels y"

        def log_prob(x_in):
            logits = model.apply(params, x_in, t).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return jnp.take_along_axis(logp, y[:, None], axis=-1).sum()

        return scale * jax.grad(log_prob)(x)

    return cond_fn
