"""Device-time measurement via jax.profiler traces (wall clock over the
axon tunnel is unreliable: executions are memoized/async).

Usage: device_time("label", fn, argsets) -> per-call device ms.
"""
import glob
import gzip
import json
import os
import tempfile
from collections import defaultdict

import jax

__all__ = ["device_time", "op_breakdown"]


def _collect(logdir):
    tj = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(tj, "rt") as fh:
        trace = json.load(fh)
    events = trace["traceEvents"]
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    by_name = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pids.get(e.get("pid"), ""):
            continue
        by_name[e.get("name", "")] += e.get("dur", 0) / 1e3
    return by_name


def _run(fn, argsets, n):
    out = fn(*argsets[0])
    jax.block_until_ready(out)
    logdir = tempfile.mkdtemp(prefix="tputime_")
    with jax.profiler.trace(logdir):
        for i in range(n):
            out = fn(*argsets[i % len(argsets)])
        jax.block_until_ready(out)
    return _collect(logdir)


def device_time(label, fn, argsets, n=6, top=0):
    """Print and return total device ms per call (top-level ops only).

    Top-level = excludes nested events; we approximate by taking the
    module-level jit event if present, else summing non-nested names.
    """
    by_name = _run(fn, argsets, n)
    jits = {k: v for k, v in by_name.items() if k.startswith("jit")}
    if jits:
        total = sum(jits.values()) / n
    else:
        total = sum(by_name.values()) / n
    print(f"{label:56s} {total:9.3f} ms/call")
    if top:
        for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
            print(f"    {dur / n:9.3f} ms  {name[:100]}")
    return total


def op_breakdown(fn, argsets, n=3, top=30):
    by_name = _run(fn, argsets, n)
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur / n:9.3f} ms  {name[:110]}")
    return by_name
