"""Ring attention: sequence-parallel attention over the device mesh.

The reference has no sequence parallelism — attention flattens all (T x L)
latent-image tokens onto one GPU and pays O(N^2) memory (SURVEY §5.7).  This
is the additive TPU capability for latent images beyond single-chip memory:
shard the token axis over the mesh, keep Q local, and rotate K/V shards
around the ring with ``jax.lax.ppermute`` (ICI neighbor exchange), combining
partial results with the online-softmax (flash) recurrence.  Compute and
communication overlap naturally: each ring hop's DMA runs while the previous
block's attention is computed.

Composable with the single-chip Pallas flash kernel for the local blocks
(here the local block is one einsum — token counts per shard are modest).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ring_attention(q, k, v, mesh: Mesh, axis: str = "data"):
    """Sequence-parallel attention.

    ``q, k, v``: ``(BH, N, D)`` with the token axis N sharded over ``axis``
    (replicated inputs are resharded).  Returns ``(BH, N, D)`` with the same
    sharding.  Requires N divisible by the mesh axis size.
    """
    n_dev = mesh.shape[axis]
    bh, n, d = q.shape
    assert n % n_dev == 0, f"token axis {n} not divisible by mesh {n_dev}"
    scale = 1.0 / np.sqrt(d)

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def local(q_loc, k_loc, v_loc):
        m = jnp.full((bh, q_loc.shape[1], 1), -1e30, jnp.float32)
        l = jnp.zeros((bh, q_loc.shape[1], 1), jnp.float32)
        acc = jnp.zeros((bh, q_loc.shape[1], d), jnp.float32)

        def body(carry, _):
            k_cur, v_cur, m, l, acc = carry
            s = jnp.einsum("bqd,bkd->bqk", q_loc, k_cur,
                           preferred_element_type=jnp.float32) * scale
            m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l = alpha * l + p.sum(axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum(
                "bqk,bkd->bqd", p.astype(v_cur.dtype), v_cur,
                preferred_element_type=jnp.float32)
            # rotate the K/V shard to the next device over ICI
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            return (k_nxt, v_nxt, m_new, l, acc), None

        (k_loc, v_loc, m, l, acc), _ = jax.lax.scan(
            body, (k_loc, v_loc, m, l, acc), None, length=n_dev)
        return (acc / l).astype(q.dtype)

    spec = P(None, axis, None)
    shard_fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                             out_specs=spec, check_vma=False)
    sharding = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
    return shard_fn(q, k, v)
