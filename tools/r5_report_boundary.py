#!/usr/bin/env python
"""One-shot boundary watcher for the live r5 queue.

The running r5 supervisor (launched before the report-step fix in
tools/r5_supervisor.py) holds the OLD step list in memory: its report step
would run demo_report.py without --n-gen/--sample-steps and produce a
below-bar 64-sample/500-step report.  This watcher waits for the f4
conditional evidence JSON to land (written by demo_conditional.py just
before it exits), then

1. kills the supervisor by PID (from /tmp/r5sup.pid) so it cannot spawn
   the flagless report child (the conditional child itself is unaffected:
   run_step children are their own process groups);
2. if the flagless report child already spawned (lost race), kills that
   exact PID's process group — found by /proc cmdline scan for the
   demo_report entry point WITHOUT --n-gen (never pattern-kill: PIDs only);
3. waits for the conditional child to release the chip (no live child of
   the old queue), then runs the report with the evidence-bar parameters
   (n_gen 256, 1000 steps), supervised by the same wedge-retry machinery.

Usage: nohup python tools/r5_report_boundary.py > /tmp/r5_boundary.log 2>&1 &
"""
import json
import os
import signal
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
COND = os.path.join(REPO, "examples", "demo_conditional.json")
F4 = "examples/demo_out_f4"
# split so this script's own cmdline never contains the needle
NEEDLE = "demo_" + "report.py"


def conditional_landed():
    try:
        with open(COND) as f:
            rep = json.load(f)
        return rep.get("run_dir") == "demo_out_f4"
    except (OSError, ValueError):
        return False


def pids_running(needle, require_missing_flag=None):
    """PIDs whose cmdline contains ``needle`` (and lacks a flag), excluding us."""
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == os.getpid():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace")
        except OSError:
            continue
        if needle in cmd:
            if require_missing_flag and require_missing_flag in cmd:
                continue
            out.append(int(pid))
    return out


def main():
    print(f"[{time.strftime('%H:%M:%S')}] watching for f4 conditional "
          "evidence ...", flush=True)
    while not conditional_landed():
        time.sleep(5)
    print(f"[{time.strftime('%H:%M:%S')}] f4 conditional landed - "
          "stopping the stale supervisor", flush=True)

    try:
        with open("/tmp/r5sup.pid") as f:
            sup_pid = int(f.read().strip())
        os.kill(sup_pid, signal.SIGKILL)
        print(f"killed supervisor pid {sup_pid}", flush=True)
    except (OSError, ValueError) as e:
        print(f"supervisor not killed ({e}) - may have exited", flush=True)

    # lost-race cleanup: a flagless report child (no --n-gen in cmdline)
    for pid in pids_running(NEEDLE, require_missing_flag="--n-gen"):
        try:
            os.killpg(os.getpgid(pid), signal.SIGTERM)
            print(f"killed stale flagless report pgid of {pid}", flush=True)
        except OSError:
            pass

    # wait for the conditional child to finish its plots/exit so the chip
    # is free (the JSON is written before the figures)
    cond_needle = "demo_" + "conditional.py"
    while pids_running(cond_needle):
        time.sleep(5)
    print(f"[{time.strftime('%H:%M:%S')}] chip free - launching the "
          "properly-parameterized report", flush=True)

    import r4_supervisor as sup
    sup.LOG = "/tmp/r5_queue.log"
    ok = sup.run_step(
        "f4 quality report (n_gen 256, 1000 steps) [boundary relaunch]",
        10800, 3,
        [sys.executable, "-u", "examples/demo_report.py", "--out", F4,
         "--n-gen", "256", "--sample-steps", "1000"],
        [F4, "examples/demo_report.json"],
        stall_s=900)
    print(f"report: {'ok' if ok else 'FAILED'}", flush=True)


if __name__ == "__main__":
    main()
