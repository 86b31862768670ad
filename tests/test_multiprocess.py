"""Two-process distributed execution test (reference multi-rank coverage:
``dist_util.py:21-83`` bootstrap + ``train_util.py:272-295`` rank-gated
checkpointing).  Spawns 2 OS processes, each with 2 virtual CPU devices,
forming one 4-device global mesh; runs sharded train steps, a collective
Orbax save, and a restore round-trip."""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize("nprocs", [2, 4])
def test_multi_process_train_save_restore(tmp_path, nprocs):
    """2 and 4 OS processes x 2 virtual devices (4- and 8-device global
    meshes): sharded steps, deterministic loss-aware sampler state on every
    process, collective Orbax save, EMA + param restore round trip."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multiprocess_worker.py"),
             str(i), str(nprocs), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        # generous: two cold JAX imports + compiles can share one CPU core
        # with other jobs on small CI hosts
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            out, _ = p.communicate()
            pytest.fail(f"proc timed out; partial output:\n{out[-4000:]}")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i} OK" in out
    # rank-suffixed log file written by process 1
    assert os.path.exists(tmp_path / "logs" / "log-rank001.txt")

    # the loss-aware sampler state is replicated-deterministic: identical
    # on every process (reference requirement, resample.py:106-121)
    import numpy as np
    ref = np.load(tmp_path / "sampler_state_proc0.npz")
    for i in range(1, nprocs):
        other = np.load(tmp_path / f"sampler_state_proc{i}.npz")
        assert set(ref.files) == set(other.files)
        for k in ref.files:
            np.testing.assert_array_equal(ref[k], other[k],
                                          err_msg=f"proc {i} key {k}")
