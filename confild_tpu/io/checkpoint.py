"""Framework-native checkpointing.

Checkpoints are plain pickled numpy pytrees (host-portable, torch-free).
The directory layouts mirror the reference contracts so resume-discovery
logic matches:

* CNF: ``checkpoint_{epoch}.ckpt`` with model/latents/optimizer states/epoch
  (reference ``ConditionalNeuralField/scripts/train.py:468-528``), plus a
  one-time ``normalizer_params.ckpt`` (:204-213).
* diffusion: ``model{step:06d}.ckpt`` / ``ema_{rate}_{step:06d}.ckpt`` /
  ``opt{step:06d}.ckpt`` triplets (reference ``train_util.py:272-295``),
  resume step parsed from the filename (:298-311).
"""

from __future__ import annotations

import glob
import os
import pickle
import shutil
import re
from typing import Any

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    # device_get batches the whole tree into one transfer (per-leaf
    # np.asarray costs a host round-trip each — seconds over a TPU tunnel)
    return jax.tree.map(lambda x: np.asarray(x), jax.device_get(tree))


def save_pytree(path: str, tree: Any) -> None:
    """Process-aware save: single-process writes a pickled numpy pytree;
    multi-process delegates to Orbax, where each host writes only its
    addressable shards (replacing the reference's rank-0 blobfile write +
    barrier, ``train_util.py:272-295``).  Every process must call this
    (the Orbax save is collective)."""
    if jax.process_count() > 1:
        save_sharded(path, tree)
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_host(tree), f, protocol=pickle.HIGHEST_PROTOCOL)
    if os.path.isdir(path):   # overwriting an Orbax (directory) checkpoint:
        # a directory cannot be atomically replaced by a file, so rename it
        # aside first.  A crash between the rename and the replace leaves a
        # small window with only ``path + ".old"`` present — recoverable:
        # ``latest_checkpoint`` restores stranded ``.old`` directories.
        old = path + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(path, old)
        os.replace(tmp, path)
        shutil.rmtree(old)
    else:
        os.replace(tmp, path)


def load_pytree(path: str, template: Any | None = None) -> Any:
    """Load either backend: Orbax checkpoints are directories, pickles are
    files.  ``template`` (pytree of arrays/ShapeDtypeStructs with shardings)
    places restored shards directly on devices."""
    if os.path.isdir(path):
        return restore_sharded(path, template)
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_checkpoint(save_path: str, pattern: str = "checkpoint_*.ckpt") -> tuple[str, int] | None:
    """Find the newest ``checkpoint_{id}`` file (reference ``load(-1)``
    discovery, ``scripts/train.py:483-496``).  Returns (path, id) or None."""
    # crash recovery: save_pytree renames a directory checkpoint to
    # ``*.old`` before replacing it with the new file; a crash in that
    # window strands the data under a name this glob would miss
    for stranded in glob.glob(os.path.join(save_path, pattern + ".old")):
        target = stranded[: -len(".old")]
        if not os.path.exists(target):
            os.rename(stranded, target)
    paths = glob.glob(os.path.join(save_path, pattern))
    best = None
    for p in paths:
        m = re.search(r"_(\d+)\.\w+$", p)
        if m:
            i = int(m.group(1))
            if best is None or i > best[1]:
                best = (p, i)
    return best


def rotate_checkpoints(save_path: str, keep: int,
                       kind: str = "cnf") -> list[str]:
    """Delete all but the newest ``keep`` checkpoint generations in
    ``save_path`` (additive over the reference, which accumulates every
    save forever — 400k-step runs at save_interval 10k leave 120 files,
    ``train_util.py:272-295``).  ``kind``:

    * ``"cnf"`` — ``checkpoint_{epoch}.ckpt`` generations,
    * ``"diffusion"`` — ``model/ema_*/opt{step:06d}.ckpt`` triplets rotated
      as a unit, so a kept model always has its EMA + optimizer siblings.

    Orbax (directory) checkpoints are removed recursively.  Multi-process:
    only process 0 deletes (the files live on a shared filesystem); callers
    need no barrier because deletion only touches generations strictly older
    than the save that just completed.  Returns the deleted paths."""
    if not keep or keep <= 0 or jax.process_index() != 0:
        return []
    if kind == "cnf":
        groups: dict[int, list[str]] = {}
        for p in glob.glob(os.path.join(save_path, "checkpoint_*.ckpt")):
            m = re.search(r"_(\d+)\.\w+$", p)
            if m:
                groups.setdefault(int(m.group(1)), []).append(p)
    elif kind == "diffusion":
        groups = {}
        for p in glob.glob(os.path.join(save_path, "*.ckpt")):
            m = re.search(r"(?:model|opt|ema_[\d.]+_)(\d+)\.\w+$",
                          os.path.basename(p))
            if m:
                groups.setdefault(int(m.group(1)), []).append(p)
    else:
        raise ValueError(f"unknown checkpoint kind {kind!r}")
    deleted = []
    for gen in sorted(groups)[:-keep]:
        for p in groups[gen]:
            (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
            deleted.append(p)
    return deleted


def parse_resume_step(filename: str) -> int:
    """``model123456.ckpt -> 123456`` (reference ``train_util.py:298-311``)."""
    m = re.search(r"model(\d+)\.\w+$", os.path.basename(filename))
    return int(m.group(1)) if m else 0


def find_ema_checkpoint(main_path: str | None, step: int, rate: str) -> str | None:
    if main_path is None:
        return None
    path = os.path.join(os.path.dirname(main_path), f"ema_{rate}_{step:06d}.ckpt")
    return path if os.path.exists(path) else None


# ---------------------------------------------------------------------------
# Orbax backend (sharded, multi-host-safe)
# ---------------------------------------------------------------------------

def save_sharded(path: str, tree: Any) -> None:
    """Save a (possibly sharded) pytree with Orbax — each host writes only its
    addressable shards, replacing the reference's rank-0 blobfile writes +
    barrier (``train_util.py:272-295``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def sharded_metadata(path: str) -> Any:
    """Structure-only metadata of an Orbax checkpoint (pytree of objects
    with ``.shape``/``.dtype``) — lets callers size restore templates from
    the CHECKPOINT's shapes instead of assuming current-run shapes."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.metadata(os.path.abspath(path))


def restore_sharded(path: str, template: Any | None = None) -> Any:
    """Restore an Orbax checkpoint; pass ``template`` (a pytree of arrays or
    ShapeDtypeStructs with shardings) to place shards directly on devices —
    replacing the reference's rank-0 read + chunked MPI broadcast
    (``dist_util.py:54-74``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, template)
        return ckptr.restore(path)
