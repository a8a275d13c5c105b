"""Reproduce bench.py's exact path with per-step timing."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sexy_raytracer_tpu.diff.inverse import TrainState, make_train_step
from sexy_raytracer_tpu.diff.params import extract_params
from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.parallel.mesh import make_mesh, replicate_scene, shard_rays
from sexy_raytracer_tpu.render.camera import Camera

print("backend:", jax.default_backend(), jax.devices())
scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)

mesh = make_mesh()
print("mesh:", mesh)

spb = 4
pixels = 32768
optimizer = optax.adam(1e-3)
params = extract_params(scene)
state = TrainState(params, optimizer.init(params), jnp.int32(0))
step = make_train_step(mesh, cfg, optimizer, spb=spb, method="auto")

scene_r = replicate_scene(scene, mesh)
rng = np.random.default_rng(0)
ids = rng.integers(0, cfg.width * cfg.height, size=pixels).astype(np.int32)
pix = shard_rays(jnp.asarray(ids), mesh)
tgt = shard_rays(jnp.full((pixels, 3), 0.5, jnp.float32), mesh)

t0 = time.time()
state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(0))
_ = float(loss)
print(f"warmup+compile: {time.time()-t0:.2f}s")

for i in range(6):
    t0 = time.time()
    state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(i + 1))
    _ = float(loss)
    print(f"step {i}: {(time.time()-t0)*1e3:.1f} ms")
