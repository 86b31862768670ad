"""Device mesh + sharding helpers — the framework's entire distributed layer.

Replaces the reference's MPI bootstrap + NCCL process groups + DDP
(``src/dist_util.py``, ``ConditionalNeuralField/scripts/train.py:292-371``)
with the JAX runtime: one mesh, ``NamedSharding`` annotations, and XLA-compiled
collectives over ICI/DCN.  There is no rank-0 parameter broadcast — replicated
arrays are materialized identically on every device by construction — and no
explicit gradient allreduce: ``jit`` inserts ``psum`` where the batch axis is
sharded.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

# mesh axes reserved for non-batch parallelism; every other axis is treated
# as data-parallel by ``batch_axes`` (hybrid DCN x ICI meshes shard the batch
# over ('replica', 'data') jointly)
NON_BATCH_AXES = frozenset({"model", "tensor", "seq", "pipe", "pipeline"})


def batch_axes(mesh: Mesh) -> tuple[str, ...]:
    """The mesh axes the batch dim shards over: every axis not reserved for
    model/tensor/sequence/pipeline parallelism.  A 1-D ``('data',)`` mesh
    returns ``('data',)``; a hybrid ``('replica', 'data')`` mesh returns both,
    so the gradient psum is hierarchical (intra-slice over ICI first, then
    cross-slice over DCN — XLA picks the decomposition from the topology)."""
    return tuple(a for a in mesh.axis_names if a not in NON_BATCH_AXES)


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding dim 0 over all data-parallel mesh axes."""
    axes = batch_axes(mesh)
    if not axes:
        raise ValueError(
            f"mesh {mesh.axis_names} has no data-parallel axis (all axes are "
            f"in NON_BATCH_AXES={sorted(NON_BATCH_AXES)}); add a batch axis "
            f"such as 'data' to shard inputs over it")
    return P(axes if len(axes) > 1 else axes[0])


def initialize_distributed(**kwargs) -> None:
    """Multi-host bootstrap (replaces ``dist_util.setup_dist``).  No-op on a
    single host; on a TPU pod slice JAX discovers peers from the environment."""
    # check kwargs first: jax.process_count() would initialize the backend,
    # and jax.distributed.initialize must run before any backend touch
    if kwargs or jax.process_count() > 1:
        jax.distributed.initialize(**kwargs)


def get_mesh(n_devices: int | None = None,
             axis_names: Sequence[str] = (DATA_AXIS,),
             devices=None) -> Mesh:
    """1-D data mesh by default; pass ``axis_names=('data', 'model')`` etc.
    with a matching device grid for hybrid layouts."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f"requested a {n_devices}-device mesh but only "
                    f"{len(devices)} devices are visible; set "
                    f"XLA_FLAGS=--xla_force_host_platform_device_count="
                    f"{n_devices} (with JAX_PLATFORMS=cpu) before backend "
                    f"init to test sharding on a virtual mesh")
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    if len(axis_names) > 1:
        raise ValueError("pass an explicit device grid for multi-axis meshes"
                         " (or use get_hybrid_mesh for DCN x ICI layouts)")
    return Mesh(devices, axis_names)


def get_hybrid_mesh(n_slices: int | None = None,
                    axis_names: Sequence[str] = ("replica", DATA_AXIS),
                    devices=None) -> Mesh:
    """2-D data mesh for multi-slice pods: axis 0 ('replica') crosses slices
    over DCN, axis 1 ('data') stays inside a slice over ICI.  Batch shards
    over BOTH axes (see ``batch_spec``); parameters are replicated, so the
    only DCN traffic is the cross-slice portion of the gradient psum —
    the layout the scaling-book recipe prescribes for pure data parallelism.

    On real multi-slice hardware the grid comes from each device's
    ``slice_index``; on single-slice or virtual (CPU) backends pass
    ``n_slices`` to fold the device list into an (n_slices, per_slice) grid
    for testing."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    slice_ids = sorted({getattr(d, "slice_index", 0) or 0 for d in devices})
    if len(slice_ids) > 1:
        by_slice = [[d for d in devices
                     if (getattr(d, "slice_index", 0) or 0) == s]
                    for s in slice_ids]
        per = len(by_slice[0])
        if any(len(row) != per for row in by_slice):
            raise ValueError("uneven devices per slice: "
                             f"{[len(r) for r in by_slice]}")
        grid = np.asarray(by_slice)
    else:
        n_slices = n_slices or 1
        if len(devices) % n_slices:
            raise ValueError(f"{len(devices)} devices do not fold into "
                             f"{n_slices} slices")
        grid = np.asarray(devices).reshape(n_slices, -1)
    return Mesh(grid, tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dim ``axis`` over every data-parallel mesh axis (one axis on a
    flat mesh, ('replica', 'data') jointly on a hybrid mesh)."""
    spec = [None] * ndim
    spec[axis] = batch_spec(mesh)[0]  # raises clearly if no batch axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _global_put(x, sharding: NamedSharding):
    """Place a host value (or a process-local array every host holds in
    full) under a global sharding.  Committed device arrays are staged
    through host numpy first — a direct device_put of a single-device array
    to a multi-host sharding is a cross-host transfer, which DCN-less
    backends reject."""
    if isinstance(x, jax.Array):
        if x.sharding == sharding:
            return x
        if jax.process_count() > 1 and x.is_fully_addressable:
            if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
                data = jax.device_put(np.asarray(jax.random.key_data(x)),
                                      sharding)
                return jax.random.wrap_key_data(data,
                                                impl=jax.random.key_impl(x))
            x = np.asarray(x)
    return jax.device_put(x, sharding)


def shard_batch(batch: Any, mesh: Mesh, axis: int = 0) -> Any:
    """Device-put every leaf with its leading dim sharded over the mesh.
    In a multi-process run every process must pass the same global batch;
    each host materializes only its addressable shards."""
    def put(x):
        return _global_put(x, data_sharding(mesh, np.ndim(x), axis))
    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: _global_put(x, sharding), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k
