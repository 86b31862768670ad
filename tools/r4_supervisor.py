#!/usr/bin/env python
"""Round-4 evidence-queue supervisor (f2 retrain relaunch) with TPU-wedge recovery.

The axon TPU tunnel occasionally wedges per-connection: the victim process
blocks forever inside a compute RPC (near-zero CPU, no file writes) while a
fresh process can use the chip immediately. This supervisor runs each queue
step as a child process and watches two liveness signals — the child's
cumulative CPU ticks and the newest mtime under its output paths. If BOTH
freeze for --stall-min minutes the child is declared wedged, killed by PID,
and the step is retried (every step resumes from its own checkpoints or is
idempotent). Normal slow compute keeps at least one signal moving: trainers
write progress/checkpoints every few minutes and the host burns CPU feeding
the device.

Usage: python tools/r3_supervisor.py  (logs to /tmp/r4_queue.log)
"""
import os
import signal
import subprocess
import sys
import time

REPO = "/root/repo"
LOG = "/tmp/r4_queue.log"

# (name, timeout_s, retries, cmd, watch_paths)
#
# The r3f queue: a full pipeline on the FORCED (statistically stationary)
# flow — the regime of every reference case and the precondition for the
# conditional experiment (held-out trajectories live on the training
# attractor; the decaying flow's random-IC held-outs were out of prior
# support by construction: frozen-decoder oracle rMAE 0.41, DPS field
# rMAE ~1.0).  Trains decoder + windowed diffusion prior from scratch on
# 16 traj x 384 snaps, then runs the conditional-DPS experiment on
# fresh-seed held-out trajectories.
STEPS = [
    (
        "f2 pipeline (forced, hidden 256, latent 256, windowed sigma-scaled)",
        28800,
        6,
        [sys.executable, "-u", "examples/demo_turbulence.py",
         "--flow", "forced", "--out", "examples/demo_out_f2",
         "--n-traj", "16", "--n-snap", "384",
         "--window", "64", "--window-stride", "4",
         "--latent", "256", "--hidden", "256",
         "--cnf-epochs", "16000", "--latent-lr-end", "1e-4",
         # 20k (not 30k): at ~1.5 steps/s the last 10k steps would eat the
         # entire evidence window this round; 20k is ~990 epochs over the
         # 1296 windowed images and the sigma-scaled data (not step count)
         # is what the f2 bet changes.  Resumes from the 10k checkpoint.
         "--diff-steps", "20000", "--diff-batch", "64",
         "--scale-sigmas", "2.5"],
        ["examples/demo_out_f2"],
    ),
    (
        "conditional DPS experiment (f2 prior)",
        10800,
        3,
        [sys.executable, "-u", "examples/demo_conditional.py",
         "--out", "examples/demo_out_f2"],
        ["examples/demo_out_f2"],
    ),
    (
        "quality report on the f2 prior (n_gen 256, 1000 steps)",
        10800,
        3,
        [sys.executable, "-u", "examples/demo_report.py",
         "--out", "examples/demo_out_f2"],
        ["examples/demo_out_f2", "examples/demo_report.json"],
    ),
    (
        "respacing study (f2, n_gen 256)",
        10800,
        3,
        [sys.executable, "-u", "tools/respacing_study.py",
         "--out", "examples/demo_out_f2", "--n-gen", "256"],
        ["examples/demo_out_f2", "examples/demo_respacing.json"],
    ),
]


def log(msg):
    with open(LOG, "a") as f:
        f.write(f"== {time.strftime('%H:%M:%S', time.gmtime())} {msg}\n")


def cpu_ticks(pid):
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return int(parts[11]) + int(parts[12])  # utime + stime
    except (OSError, IndexError, ValueError):
        return None


def newest_mtime(paths):
    newest = 0.0
    for p in paths:
        p = os.path.join(REPO, p)
        if os.path.isfile(p):
            newest = max(newest, os.path.getmtime(p))
        elif os.path.isdir(p):
            for root, _, names in os.walk(p):
                for n in names:
                    try:
                        newest = max(newest,
                                     os.path.getmtime(os.path.join(root, n)))
                    except OSError:
                        pass
    return newest


def kill_tree(proc):
    # the child is its own process group leader (start_new_session)
    try:
        os.killpg(proc.pid, signal.SIGTERM)
    except OSError:
        pass
    try:
        proc.wait(timeout=15)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except OSError:
            pass
        proc.wait()


def _worker_crashed(tail_bytes=8192):
    """True when the step's LOG tail shows an axon-environment death
    (worker crash/restart) rather than a code bug — those are retryable:
    the chip-side worker occasionally dies on long single XLA programs
    (observed r5 11:33 killing a whole evidence step with retries left)."""
    try:
        with open(LOG, "rb") as f:
            f.seek(0, 2)
            f.seek(max(f.tell() - tail_bytes, 0))
            tail = f.read().decode(errors="replace")
    except OSError:
        return False
    return ("TPU worker process crashed" in tail
            or "UNAVAILABLE: TPU worker" in tail
            or "TPU backend error" in tail
            or "FAILED_PRECONDITION" in tail)


def run_step(name, timeout_s, retries, cmd, watch_paths, stall_s):
    for attempt in range(1, retries + 1):
        log(f"{name} (attempt {attempt}/{retries})")
        with open(LOG, "a") as out:
            proc = subprocess.Popen(cmd, cwd=REPO, stdout=out,
                                    stderr=subprocess.STDOUT,
                                    start_new_session=True)
        start = time.time()
        last_ticks = cpu_ticks(proc.pid) or 0
        last_mtime = newest_mtime(watch_paths)
        frozen_since = time.time()
        wedged = False
        while True:
            try:
                rc = proc.wait(timeout=60)
                break
            except subprocess.TimeoutExpired:
                pass
            now = time.time()
            if now - start > timeout_s:
                log(f"{name}: hard timeout {timeout_s}s, killing")
                kill_tree(proc)
                rc = "timeout"
                break
            ticks = cpu_ticks(proc.pid)
            mtime = newest_mtime(watch_paths)
            # the CPU-liveness bar scales with the stall window: a wedged
            # RPC still drips ~0.1 ticks/s (observed r5), which crosses a
            # flat 50-tick bar every ~8 min and defeats any window >500s;
            # demanding stall_s/5 ticks (1.8s CPU per 900s) keeps healthy
            # compute/compile phases alive while drip-wedges get caught
            moved = (ticks is None
                     or ticks - last_ticks >= max(50, stall_s // 5)
                     or mtime > last_mtime)
            if moved:
                last_ticks = ticks if ticks is not None else last_ticks
                last_mtime = max(last_mtime, mtime)
                frozen_since = now
            elif now - frozen_since > stall_s:
                log(f"{name}: wedged (no CPU/file activity "
                    f"{int(now - frozen_since)}s), killing for retry")
                kill_tree(proc)
                wedged = True
                rc = "wedged"
                break
        log(f"{name} rc={rc}")
        if rc == 0:
            return True
        if not wedged and rc != "timeout" and not _worker_crashed():
            return False  # genuine failure: don't burn retries
        time.sleep(30)
    return False


def main():
    stall_s = int(os.environ.get("R3_STALL_S", "1500"))
    log(f"supervisor start (stall threshold {stall_s}s)")
    for name, timeout_s, retries, cmd, watch in STEPS:
        ok = run_step(name, timeout_s, retries, cmd, watch, stall_s)
        log(f"{name}: {'ok' if ok else 'FAILED — moving on'}")
    log("queue done (supervisor)")


if __name__ == "__main__":
    main()
