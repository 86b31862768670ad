"""Blockwise (flash) attention Pallas kernels for TPU — forward AND backward.

The reference's AttentionBlock materializes the full O(N^2) weight matrix
over all flattened spatial tokens (``src/unet.py:328-393``); fine at the
CoNFiLD cases' token counts (<= 2304), but quadratic memory caps latent-image
growth (SURVEY §5.7 names blockwise attention as the TPU plan).

Forward: online-softmax attention with O(N) memory — grid over
(batch*heads, q-blocks, kv-blocks), running (max, denom, accumulator) in
VMEM scratch across the kv axis; emits the per-row logsumexp as a residual.

Backward: FlashAttention-2 style two-pass recompute — only the (N,)-sized
logsumexp L and the row dot D = rowsum(dO * O) are stored between passes;
each pass rebuilds P = exp(S - L) blockwise, so no O(N^2) intermediate ever
exists in HBM:

  dV_j = sum_i P_ij^T dO_i
  dS_ij = P_ij * (dO_i V_j^T - D_i)
  dQ_i  = scale * sum_j dS_ij K_j       (kernel A: grid over q-blocks)
  dK_j  = scale * sum_i dS_ij^T Q_i     (kernel B: grid over kv-blocks)

Numerics match the reference attention: logits scaled by 1/sqrt(d)
(the reference's two-sided 1/sqrt(sqrt(d)) folding), softmax in f32.
Ragged token counts are handled by padding to the block size and masking
padded KEY columns to -inf logits inside the kernels (padded queries
produce garbage rows that are sliced off).
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


def _key_mask(kb: int, block_k: int, n: int, block_q: int):
    """(block_q, block_k) mask: True for real (non-padded) key columns."""
    col = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    return col < n


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                  *, scale: float, nk: int, block_q: int, block_k: int,
                  n: int, masked: bool):
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
    if masked:
        s = jnp.where(_key_mask(kb, block_k, n, block_q), s, _NEG_INF)

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
        # (Bq, 1) trailing unit lane dim: TPU block shapes require the last
        # two dims to be (8,128)-divisible or equal to the array dims; a
        # (1, block_q) row block is neither, a (1, block_q, 1) block is
        lse_ref[0] = m_scr[...] + jnp.log(l_scr[...])


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
    """q, k, v: (BH, N, D) -> ((BH, N, D) out, (BH, N) f32 logsumexp)."""
    bh, n, d = q.shape
    scale = 1.0 / np.sqrt(d)

    qp = _pad_axis(q, 1, block_q)
    kp = _pad_axis(k, 1, block_k)
    vp = _pad_axis(v, 1, block_k)
    nq_pad, nk_pad = qp.shape[1], kp.shape[1]

    grid = (bh, nq_pad // block_q, nk_pad // block_k)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale,
                          nk=nk_pad // block_k, block_q=block_q,
                          block_k=block_k, n=n, masked=nk_pad != n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nq_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qp, kp, vp)
    return out[:, :n, :], lse[:, :n, 0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_scr, *, scale: float, nk: int, block_q: int,
                   block_k: int, n: int, masked: bool):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]                          # (Bq, 1)
    delta = delta_ref[0]                      # (Bq, 1)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    if masked:
        s = jnp.where(_key_mask(kb, block_k, n, block_q), s, _NEG_INF)
    p = jnp.exp(s - lse)                      # (Bq, Bk); 0 at padded keys
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq_scr[...] += scale * jnp.dot(ds.astype(k.dtype), k,
                                   preferred_element_type=jnp.float32)

    @pl.when(kb == nk - 1)
    def _finish():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float, nq: int,
                    block_q: int, block_k: int, n: int, masked: bool):
    ib = pl.program_id(2)

    @pl.when(ib == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]                          # (Bq, 1)
    delta = delta_ref[0]                      # (Bq, 1)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    if masked:
        kb = pl.program_id(1)
        s = jnp.where(_key_mask(kb, block_k, n, block_q), s, _NEG_INF)
    p = jnp.exp(s - lse)                      # (Bq, Bk)
    dv_scr[...] += jnp.dot(p.astype(do.dtype).T, do,
                           preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_scr[...] += scale * jnp.dot(ds.astype(q.dtype).T, q,
                                   preferred_element_type=jnp.float32)

    @pl.when(ib == nq - 1)
    def _finish():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def _flash_backward(q, k, v, out, lse, g, block_q: int, block_k: int,
                    interpret: bool):
    bh, n, d = q.shape
    scale = 1.0 / np.sqrt(d)

    # D_i = rowsum(dO * O): the only O(N)-sized residual beyond the logsumexp.
    # Row stats travel as (BH, N, 1): TPU block shapes need the last two dims
    # (8,128)-divisible or equal to the array dims, which a (1, block_q, 1)
    # block satisfies and a (1, block_q) row block does not.
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[..., None]                          # (BH, N, 1)

    qp = _pad_axis(q, 1, block_q)
    dop = _pad_axis(g, 1, block_q)
    kp = _pad_axis(k, 1, block_k)
    vp = _pad_axis(v, 1, block_k)
    # padded QUERY rows must contribute zero to dK/dV: exp(s - lse) with
    # lse = +inf gives p = 0 for the whole padded row
    lsep = _pad_axis(lse[..., None], 1, block_q)
    if lsep.shape[1] != n:
        lsep = lsep.at[:, n:].set(jnp.inf)
    deltap = _pad_axis(delta, 1, block_q)
    nq_pad, nk_pad = qp.shape[1], kp.shape[1]
    nq_blocks, nk_blocks = nq_pad // block_q, nk_pad // block_k
    masked = nk_pad != n

    q_spec_i = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    k_spec_j = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                            memory_space=pltpu.VMEM)
    row_spec_i = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                              memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, nk=nk_blocks,
                          block_q=block_q, block_k=block_k, n=n,
                          masked=masked),
        grid=(bh, nq_blocks, nk_blocks),
        in_specs=[q_spec_i, k_spec_j, k_spec_j, q_spec_i, row_spec_i,
                  row_spec_i],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qp, kp, vp, dop, lsep, deltap)

    # kernel B: grid (bh, kv-blocks, q-blocks) — q is the reduction axis
    q_spec_j = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, j, 0),
                            memory_space=pltpu.VMEM)
    k_spec_i = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    row_spec_j = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, j, 0),
                              memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, nq=nq_blocks,
                          block_q=block_q, block_k=block_k, n=n,
                          masked=masked),
        grid=(bh, nk_blocks, nq_blocks),
        in_specs=[q_spec_j, k_spec_i, k_spec_i, q_spec_j, row_spec_j,
                  row_spec_j],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qp, kp, vp, dop, lsep, deltap)

    return dq[:, :n, :], dk[:, :n, :], dv[:, :n, :]


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

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
    return _flash_forward(q, k, v, block_q, block_k, interpret)[0]


def _fwd(q, k, v, block_q, block_k, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out, lse = _flash_forward(q, k, v, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _bwd(block_q, block_k, interpret, res, g):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q, k, v, out, lse = res
    return _flash_backward(q, k, v, out, lse, g, block_q, block_k, interpret)


flash_attention.defvjp(_fwd, _bwd)
