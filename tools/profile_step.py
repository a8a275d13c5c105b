"""Ad-hoc profiling: break the train step into parts and time each on TPU."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.render.renderer import render_pixels
from sexy_raytracer_tpu.ops.intersect import find_hit, hit_data
from sexy_raytracer_tpu.ops.shade import shade
from sexy_raytracer_tpu.utils import rng as rnglib

scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)
print("backend:", jax.default_backend(), jax.devices())

R = 131072
key = jax.random.key(0)
org = jnp.tile(jnp.asarray(camera.origin, jnp.float32)[None, :], (R, 1))
d = jax.random.normal(key, (R, 3))
dirs = d / jnp.linalg.norm(d, axis=1, keepdims=True)
times = jnp.zeros((R,))

scene_d = jax.device_put(scene)


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return out


# 1. find_hit alone (pallas)
f1 = jax.jit(lambda s, o, d, t: find_hit(s, o, d, t, method="pallas"))
timeit("find_hit pallas", f1, scene_d, org, dirs, times)

# 1b. bruteforce jnp
f1b = jax.jit(lambda s, o, d, t: find_hit(s, o, d, t, method="bruteforce"))
timeit("find_hit bruteforce-jnp", f1b, scene_d, org, dirs, times)

# 2. hit_data fwd
prim, _t = f1(scene_d, org, dirs, times)
f2 = jax.jit(hit_data)
timeit("hit_data fwd", f2, scene_d, org, dirs, times, prim)

# 3. shade fwd
rec = f2(scene_d, org, dirs, times, prim)
keys = jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(R))
u = rnglib.per_ray_uniform_block(keys, 6)
rand = {
    "unit_vector": rnglib.unit_vector_from_uniforms(u[..., 0], u[..., 1]),
    "unit_ball": rnglib.in_unit_sphere_from_uniforms(u[..., 2], u[..., 3], u[..., 4]),
    "uniform": u[..., 5],
}
f3 = jax.jit(shade)
timeit("shade fwd", f3, scene_d, rec, dirs, rand)

# 4. full forward trace (render_pixels, 4 bounces, spb=4, 32768 pixels)
pix = jnp.arange(32768, dtype=jnp.int32)
bg = jnp.asarray(cfg.background, jnp.float32)


def fwd(s):
    return render_pixels(
        s, camera, pix, 0, key, bg,
        width=cfg.width, height=cfg.height, spb=4,
        spp_total=cfg.samples_per_pixel, max_bounce=4, method="pallas",
    ).sum()

f4 = jax.jit(fwd)
timeit("forward render_pixels 131k paths", f4, scene_d)

# 5. fwd+bwd w.r.t. trainable params
from sexy_raytracer_tpu.diff.params import extract_params, merge_params

params = extract_params(scene_d)
print("trainable params:", {k: v.shape for k, v in params.items()})


def loss(p, s):
    full = merge_params(s, p)
    return fwd(full)

f5 = jax.jit(jax.value_and_grad(loss))
timeit("fwd+bwd value_and_grad", f5, params, scene_d)

# 6. hit_data+shade fwd+bwd only (no find_hit inside grad)
def loss2(p, s):
    full = merge_params(s, p)
    rec = hit_data(full, org, dirs, times, prim)
    samp = shade(full, rec, dirs, rand)
    return samp.attenuation.sum() + samp.emitted.sum()

f6 = jax.jit(jax.value_and_grad(loss2))
timeit("hit_data+shade fwd+bwd (1 bounce)", f6, params, scene_d)
