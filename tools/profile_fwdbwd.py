"""Forward vs backward device-op profile of render_pixels (no shard_map)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from sexy_raytracer_tpu.diff.inverse import sample_tile_ids
from sexy_raytracer_tpu.diff.params import extract_params, merge_params
from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.render.renderer import render_pixels
from tputime import device_time, op_breakdown

method = os.environ.get("SRT_METHOD", "auto")
scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)
scene = jax.device_put(scene)
background = jnp.asarray(cfg.background, jnp.float32)

spb = 4
pixels = 32768
rng = np.random.default_rng(0)
idsets = [jnp.asarray(sample_tile_ids(rng, cfg.width, cfg.height, pixels))
          for _ in range(6)]

kw = dict(width=cfg.width, height=cfg.height, spb=spb, spp_total=spb,
          max_bounce=cfg.max_bounce, method=method)

f_fwd = jax.jit(lambda p, k: render_pixels(
    scene, camera, p, jnp.int32(0), k, background, **kw))

params = extract_params(scene)
tgt = jnp.full((pixels, 3), 0.5)

def loss(prm, p, k):
    s2 = merge_params(scene, prm)
    rad = render_pixels(s2, camera, p, jnp.int32(0), k, background, **kw)
    res = jnp.sqrt(jnp.clip(rad / spb, 1e-8, None))
    return jnp.mean((res - tgt) ** 2)

f_grad = jax.jit(jax.grad(loss))

keysets = [jax.random.key(i) for i in range(6)]
fa = [(p, k) for p, k in zip(idsets, keysets)]
ga = [(params, p, k) for p, k in zip(idsets, keysets)]

print(f"== method={method} forward only ==")
device_time("fwd render_pixels 131k paths x4", f_fwd, fa, n=6)
print("== fwd+bwd ==")
op_breakdown(f_grad, ga, n=3, top=22)
