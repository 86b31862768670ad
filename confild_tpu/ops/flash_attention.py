"""Blockwise (flash) attention Pallas kernel for TPU.

The reference's AttentionBlock materializes the full O(N^2) weight matrix
over all flattened spatial tokens (``src/unet.py:328-393``); fine at the
CoNFiLD cases' token counts (<= 2304), but quadratic memory caps latent-image
growth (SURVEY §5.7 names blockwise attention as the TPU plan).  This kernel
computes online-softmax attention with O(N) memory: grid over
(batch*heads, q-blocks, kv-blocks), running (max, denom, accumulator) in VMEM
scratch across the kv axis.

Numerics match the reference attention: logits scaled by 1/sqrt(d)
(the reference's two-sided 1/sqrt(sqrt(d)) folding), softmax in f32.

Backward: custom VJP rematerializing through the jnp reference attention —
exact gradients, flash-speed forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, nk: int, block_q: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (Bq, D)
    k = k_ref[0]  # (Bk, D)
    v = v_ref[0]  # (Bk, D)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (Bq,Bk)

    m_prev = m_scr[...]                       # (Bq, 1)
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)                    # (Bq, Bk)
    alpha = jnp.exp(m_prev - m_new)           # (Bq, 1)
    l_new = alpha * l_scr[...] + p.sum(axis=-1, keepdims=True)
    acc = acc_scr[...] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    m_scr[...] = m_new
    l_scr[...] = l_new
    acc_scr[...] = acc

    @pl.when(kb == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)


def _pad_axis(x, axis, mult):
    size = x.shape[axis]
    target = -(-size // mult) * mult
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_forward(q, k, v, block_q: int, block_k: int, interpret: bool):
    """q, k, v: (BH, N, D) -> (BH, N, D)."""
    bh, n, d = q.shape
    scale = 1.0 / np.sqrt(d)

    qp = _pad_axis(q, 1, block_q)
    kp = _pad_axis(k, 1, block_k)
    vp = _pad_axis(v, 1, block_k)
    nq_pad, nk_pad = qp.shape[1], kp.shape[1]
    # mask padded keys with -inf logits by padding K with zeros and masking in
    # the kernel is avoided: instead pad K/V rows are zeros, their logits are
    # 0*scale = 0 which would corrupt softmax -> push them to -inf by padding
    # k with a large negative last feature?  Simplest correct route: pad and
    # then mask via an additive bias is overkill here — we require the caller
    # tokens to be padded already, so just slice the output; padded QUERIES
    # are harmless, padded KEYS must be excluded.  We exclude them by giving
    # padded keys a -inf logit through a k-norm trick only when padding was
    # needed:
    if nk_pad != n:
        # append an indicator feature: real keys contribute 0, padded keys
        # contribute NEG_INF/scale to the dot product, i.e. NEG_INF to the
        # scaled logit -> zero softmax weight
        flag = jnp.zeros((bh, nk_pad, 1), q.dtype).at[:, n:, :].set(1.0)
        kp = jnp.concatenate([kp, flag * (_NEG_INF / scale)], axis=-1)
        qp = jnp.concatenate([qp, jnp.ones((bh, nq_pad, 1), q.dtype)],
                             axis=-1)
        kp = kp.astype(q.dtype)

    dk = qp.shape[-1]
    grid = (bh, nq_pad // block_q, nk_pad // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale,
                          nk=nk_pad // block_k, block_q=block_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dk), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dk), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qp, kp, vp)
    return out[:, :n, :]


def _reference_attention(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(d)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bqk,bkd->bqd", weights.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool | None = None):
    """Online-softmax attention: q, k, v ``(BH, N, D)`` -> ``(BH, N, D)``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_forward(q, k, v, block_q, block_k, interpret)


def _fwd(q, k, v, block_q, block_k, interpret):
    return flash_attention(q, k, v, block_q, block_k, interpret), (q, k, v)


def _bwd(block_q, block_k, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
