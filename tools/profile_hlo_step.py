#!/usr/bin/env python
"""Compile the bench train step and census its HLO: op counts by type and
by source (metadata op_name), to direct op-count reduction — wall-clock
per step is device time + ~4.3us per HLO op of dispatch overhead on this
backend (measured, tools notes)."""
import os, sys, re
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
optimizer = optax.adam(1e-3)
params = extract_params(scene)
state = TrainState(params, optimizer.init(params), jnp.int32(0))
step = make_train_step(mesh, cfg, optimizer, spb=4, method="auto")
scene_r = replicate_scene(scene, mesh)
ids = sample_tile_ids(np.random.default_rng(0), cfg.width, cfg.height, 32768)
pix = shard_rays(jnp.asarray(ids), mesh)
tgt = shard_rays(jnp.full((32768, 3), 0.5, jnp.float32), mesh)

comp = step.lower(state, scene_r, camera, pix, tgt, jax.random.key(0)).compile()
txt = comp.as_text()
print(f"HLO text: {len(txt)/1e6:.1f} MB", flush=True)

# entry-computation (top-level) instruction census: these are the
# dispatched ops; fusion bodies don't count
lines = txt.splitlines()
in_entry = False
depth = 0
by_type = defaultdict(int)
by_src = defaultdict(int)
total = 0
entry_re = re.compile(r"^ENTRY ")
inst_re = re.compile(r"^\s+(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[\w[\]{},\s]*\s*(\w+)\(")
meta_re = re.compile(r'op_name="([^"]+)"')
for ln in lines:
    if entry_re.match(ln):
        in_entry = True
        continue
    if in_entry:
        if ln.startswith("}"):
            break
        m = inst_re.match(ln)
        if m:
            op = m.group(1)
            if op in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast"):
                continue
            total += 1
            by_type[op] += 1
            mm = meta_re.search(ln)
            src = mm.group(1) if mm else "?"
            # aggregate source path: strip trailing op specifics
            parts = src.split("/")
            key = "/".join(parts[:4])
            by_src[key] += 1

print(f"\nentry ops total: {total}\n")
print("--- by HLO op type ---")
for k, c in sorted(by_type.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{c:6d}  {k}")
print("\n--- by source op_name prefix (4 levels) ---")
for k, c in sorted(by_src.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{c:6d}  {k}")
