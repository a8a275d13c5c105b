#!/usr/bin/env python
"""jax.profiler trace of the FULL bench train step (with optimizer);
prints per-op device times. Identifies where the step's wall-clock goes
— fusions, Pallas kernels, optimizer update, dispatch gaps."""
import os, sys, time, glob, gzip, json
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np
import optax

from sexy_raytracer_tpu.diff.inverse import (
    TrainState, make_train_step, sample_tile_ids,
)
from sexy_raytracer_tpu.diff.params import extract_params
from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.parallel.mesh import make_mesh, replicate_scene, shard_rays
from sexy_raytracer_tpu.render.camera import Camera

scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)
mesh = make_mesh()
spb = 4
pixels = 32768
optimizer = optax.adam(1e-3)
params = extract_params(scene)
state = TrainState(params, optimizer.init(params), jnp.int32(0))
step = make_train_step(mesh, cfg, optimizer, spb=spb, method="auto")
scene_r = replicate_scene(scene, mesh)
rng = np.random.default_rng(0)
ids = sample_tile_ids(rng, cfg.width, cfg.height, pixels)
pix = shard_rays(jnp.asarray(ids), mesh)
tgt = shard_rays(jnp.full((pixels, 3), 0.5, jnp.float32), mesh)

state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(0))
_ = float(loss)
state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(0))
_ = float(loss)
t0 = time.time()
for i in range(4):
    state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(i))
_ = float(loss)
print(f"steady step: {(time.time()-t0)/4*1e3:.2f} ms", flush=True)

logdir = "/tmp/jaxtrace_step"
os.system(f"rm -rf {logdir}")
N = 3
with jax.profiler.trace(logdir):
    for i in range(N):
        state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(i))
    _ = float(loss)

tj = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(tj, "rt") as fh:
    trace = json.load(fh)
events = trace["traceEvents"]
pids = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")

by_name = defaultdict(float)
counts = defaultdict(int)
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pids.get(e.get("pid"), "")
    if "TPU" not in pname and "tpu" not in pname and "/device" not in pname.lower():
        continue
    name = e.get("name", "")
    dur = e.get("dur", 0) / 1e3
    by_name[name] += dur
    counts[name] += 1
    total += dur

print(f"\ntrack names: {sorted(set(pids.values()))}")
print(f"total device op time ({N} steps): {total:.2f} ms"
      f" -> {total/N:.2f} ms/step, {sum(counts.values())//N} ops/step\n")
for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:45]:
    print(f"{dur/N:9.3f} ms  x{counts[name]//N:<5d} {name[:100]}")
