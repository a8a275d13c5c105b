"""A/B: shard_map train step vs plain grad+adam on the 1-device mesh."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sexy_raytracer_tpu.diff.inverse import (
    TrainState, _loss_fn, make_train_step, sample_tile_ids,
)
from sexy_raytracer_tpu.diff.params import extract_params
from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.parallel.mesh import make_mesh, replicate_scene, shard_rays
from sexy_raytracer_tpu.render.camera import Camera
from tputime import device_time

scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)
mesh = make_mesh()
spb = 4
pixels = 32768
optimizer = optax.adam(1e-3)
params = extract_params(scene)
rng = np.random.default_rng(0)
ids = sample_tile_ids(rng, cfg.width, cfg.height, pixels)
tgt_np = np.full((pixels, 3), 0.5, np.float32)

# --- A: the shard_map step ------------------------------------------------
step = make_train_step(mesh, cfg, optimizer, spb=spb, method="auto")
scene_r = replicate_scene(scene, mesh)
pix = shard_rays(jnp.asarray(ids), mesh)
tgt = shard_rays(jnp.asarray(tgt_np), mesh)
state = TrainState(params, optimizer.init(params), jnp.int32(0))
state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(0))
jax.block_until_ready(loss)

def run_a(i):
    s2, l2 = step(state, scene_r, camera, pix, tgt, jax.random.key(i))
    return l2
device_time("A: shard_map step", run_a, [(i,) for i in range(1, 7)], n=4)

# --- B: plain grad + adam -------------------------------------------------
import functools
kwargs = dict(width=cfg.width, height=cfg.height, spb=spb,
              spp_total=cfg.samples_per_pixel, max_bounce=cfg.max_bounce,
              method="auto")
background = jnp.asarray(cfg.background, jnp.float32)
scene_d = jax.device_put(scene)
pix_d = jnp.asarray(ids)
tgt_d = jnp.asarray(tgt_np)

@jax.jit
def step_b(state, key):
    loss, grads = jax.value_and_grad(
        functools.partial(_loss_fn, **kwargs)
    )(state.params, scene_d, camera, pix_d, tgt_d, jnp.int32(0), key, background)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    return TrainState(
        optax.apply_updates(state.params, updates), opt_state, state.step + 1
    ), loss

state_b = TrainState(params, optimizer.init(params), jnp.int32(0))
state_b, loss = step_b(state_b, jax.random.key(0))
jax.block_until_ready(loss)

def run_b(i):
    s2, l2 = step_b(state_b, jax.random.key(i))
    return l2
device_time("B: plain grad+adam", run_b, [(i,) for i in range(1, 7)], n=4)
