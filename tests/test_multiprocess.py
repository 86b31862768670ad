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
def test_two_process_train_save_restore(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multiprocess_worker.py"),
             str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
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
