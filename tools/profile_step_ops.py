"""Device-side op breakdown of the real bench train step."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sexy_raytracer_tpu.diff.inverse import TrainState, make_train_step, sample_tile_ids
from sexy_raytracer_tpu.diff.params import extract_params
from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.parallel.mesh import make_mesh, replicate_scene, shard_rays
from sexy_raytracer_tpu.render.camera import Camera
from tputime import op_breakdown

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


def run(i):
    s2, l2 = step(state, scene_r, camera, pix, tgt, jax.random.key(i))
    return l2

op_breakdown(run, [(i,) for i in range(1, 7)], n=3, top=25)
