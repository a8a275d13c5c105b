"""Capture a jax.profiler trace of the forward pass; print per-op times.

Parses the trace.json.gz event dump (no tensorflow needed).
"""
import os, sys, time, glob, gzip, json
from collections import defaultdict
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.render.renderer import render_pixels

scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)
scene = jax.device_put(scene)
background = jnp.asarray(cfg.background, jnp.float32)

R = 131072
pix = jnp.arange(R, dtype=jnp.int32) % (cfg.width * cfg.height)

f = jax.jit(lambda s, c, p: render_pixels(
    s, c, p, jnp.int32(0), jax.random.key(1), background,
    width=cfg.width, height=cfg.height, spb=1, spp_total=1,
    max_bounce=4, method="auto"))

t0 = time.time()
out = f(scene, camera, pix)
jax.block_until_ready(out)
print(f"compile+first run: {time.time()-t0:.1f}s", flush=True)

logdir = "/tmp/jaxtrace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(3):
        out = f(scene, camera, pix)
    jax.block_until_ready(out)

tj = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(tj, "rt") as fh:
    trace = json.load(fh)

events = trace["traceEvents"]
# find TPU device op events: pid for device tracks
pids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")

by_name = defaultdict(float)
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pids.get(e.get("pid"), "")
    if "TPU" not in pname and "tpu" not in pname and "/device" not in pname.lower():
        continue
    # XLA op events live on device threads
    name = e.get("name", "")
    dur = e.get("dur", 0) / 1e3  # ms
    by_name[name] += dur
    total += dur

print(f"\ntrack names: {sorted(set(pids.values()))}")
print(f"total device op time (3 runs): {total:.2f} ms\n")
for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{dur/3:9.3f} ms  {name[:110]}")
