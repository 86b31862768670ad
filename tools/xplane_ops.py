"""Offline xplane.pb -> per-op time breakdown (no tensorboard plugin).

The tensorboard_plugin_profile native converter is unavailable in this
image (its pywrap entry point is missing), so parse the XSpace proto
directly: find the TPU device plane, sum XEvent durations per XEventMetadata
(fused-op) name, and print the top ops with their share of total device
time.  Usage: python tools/xplane_ops.py /tmp/trace_step [top_n]
"""
import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load(trace_dir):
    xs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not xs:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(xs[-1], "rb").read())
    return space


def device_op_times(space):
    """{op_name: total_ps} summed over XLA-op lines of TPU device planes."""
    per_op = collections.Counter()
    total_ps = 0
    for plane in space.planes:
        name = plane.name.lower()
        if not ("tpu" in name or "device" in name) or "host" in name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry the fused-op names; step lines do not
            if "step" in lname:
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                per_op[md.name] += ev.duration_ps
                total_ps += ev.duration_ps
    return per_op, total_ps


def classify(op):
    o = op.lower()
    if "conv" in o or "dot" in o or "einsum" in o:
        return "matmul/conv"
    if "custom-call" in o or "pallas" in o:
        return "custom-call"
    if "all-reduce" in o or "collective" in o:
        return "collective"
    if "fusion" in o:
        return "fusion(elementwise/reduce)"
    if "copy" in o or "transpose" in o or "reshape" in o or "bitcast" in o:
        return "data-movement"
    return "other"


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_step"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    space = load(trace_dir)
    per_op, total = device_op_times(space)
    if not total:
        planes = [(p.name, [l.name for l in p.lines]) for p in space.planes]
        raise SystemExit(f"no device events found; planes: {planes}")
    print(f"total device time: {total/1e12*1e3:.3f} ms (all lines summed)")
    cls = collections.Counter()
    for op, ps in per_op.items():
        cls[classify(op)] += ps
    for c, ps in cls.most_common():
        print(f"  {c:28s} {ps/total*100:5.1f}%  {ps/1e9:.3f} us")
    print("\ntop ops:")
    for op, ps in per_op.most_common(top_n):
        print(f"  {ps/total*100:5.2f}%  {ps/1e9:9.1f} us  {op[:110]}")
