#!/usr/bin/env python
"""Trace the fused bench step on the chip and print a per-op time
table parsed from the xplane proto (no tensorboard UI needed).

Aggregates device-stream events by HLO op-name prefix so the fused
step's real cost centers (pallas readout/paint, the mm-FFT einsums,
the prepare sort, elementwise fusions) are visible individually --
the standalone phase benches double-count prepare work and dispatch.

Env: BENCH_NC/BENCH_B as bench.py; BENCH_TRACE_STEPS (default 2).
"""

import collections
import gzip
import json
import os
import re
import sys
import time


def classify(name: str) -> str:
    """Bucket an HLO/TPU event name into a cost center."""
    n = name.lower()
    if "readout" in n:
        return "pallas:readout"
    if "paint" in n or "deposit" in n:
        return "pallas:paint"
    if "sort" in n:
        return "sort"
    if "dot" in n or "einsum" in n or "dot_general" in n:
        return "einsum(dft)"
    if "fft" in n:
        return "xla-fft"
    if "conv" in n:
        return "conv"
    if any(k in n for k in ("fusion", "add", "mul", "sub", "select",
                            "broadcast", "transpose", "reshape",
                            "copy", "concatenate", "slice", "iota",
                            "convert", "scatter", "gather", "reduce")):
        return "elementwise/layout"
    return "other"


def main():
    import jax
    import jax.numpy as jnp

    os.environ.setdefault("FASTPM_TPU_FFT", "mm")
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.benchlib import make_step_fn, example_particles

    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    nsteps = int(os.environ.get("BENCH_TRACE_STEPS", "2"))
    box = 1.0 * nc
    pm = PM(nc * b, box)
    x, v = example_particles(nc, box, seed=0)
    coeffs = jnp.asarray([0.05, 0.02], dtype=jnp.float32)
    step = make_step_fn(pm, donate=False)
    x1, v1, acc = step(x, v, coeffs)
    _ = float(jnp.sum(x1))

    trace_dir = os.environ.get("BENCH_TRACE_DIR", "/tmp/fpm_trace")
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(nsteps):
            x1, v1, acc = step(x1, v1, coeffs)
        _ = float(jnp.sum(x1))

    # locate the xplane.pb
    pb = None
    for root, _dirs, files in os.walk(trace_dir):
        for f in files:
            if f.endswith(".xplane.pb"):
                pb = os.path.join(root, f)
    if pb is None:
        print(json.dumps({"error": "no xplane.pb produced"}))
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(pb, "rb") as f:
        xs.ParseFromString(f.read())

    per_op = collections.Counter()
    intervals = collections.defaultdict(list)   # name -> [(t0, t1)]
    for plane in xs.planes:
        pname = plane.name
        if not ("TPU" in pname or "/device:" in pname
                or "Device" in pname):
            continue
        if "host" in pname.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            lname = line.name.lower()
            # keep only the op-level stream(s); skip derived lines
            if "step" in lname or "framework" in lname:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                if name.startswith("jit_"):
                    continue          # umbrella event double-counts
                dur = ev.duration_ps
                per_op[name] += dur
                t0 = line.timestamp_ns * 1000 + ev.offset_ps
                intervals[name].append((t0, t0 + dur))
    if not per_op:
        # fall back: dump plane/line names for debugging
        info = [(p.name, [l.name for l in p.lines]) for p in xs.planes]
        print(json.dumps({"error": "no device events", "planes": info},
                         default=str))
        return
    # timeline-union busy time per bucket: async copies that overlap
    # compute count toward their own sum but not the union
    all_iv = sorted(iv for ivs in intervals.values() for iv in ivs)
    union_ps = 0
    cur_s, cur_e = None, None
    for s, e in all_iv:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                union_ps += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        union_ps += cur_e - cur_s
    total_ps = sum(per_op.values())
    per_bucket = collections.Counter()
    for name, ps in per_op.items():
        per_bucket[classify(name)] += ps

    ms = 1e-9
    print(f"# traced {nsteps} steps; op-sum {total_ps*ms/nsteps:.1f} "
          f"ms/step, timeline-union {union_ps*ms/nsteps:.1f} ms/step")
    print("## buckets (op-sum)")
    for k, v in per_bucket.most_common():
        print(f"{k:24s} {v*ms/nsteps:9.2f} ms/step "
              f"{100.0*v/total_ps:5.1f}%")
    print("## ops >= 0.5 ms/step")
    for name, v in per_op.most_common(120):
        if v * ms / nsteps < 0.5:
            break
        print(f"{v*ms/nsteps:9.2f} ms/step  {name[:150]}")


if __name__ == "__main__":
    main()
