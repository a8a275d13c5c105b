"""Ablation profiling inside the forward trace."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.ops.intersect import find_hit, hit_data
from sexy_raytracer_tpu.ops.shade import shade
from sexy_raytracer_tpu.utils import rng as rnglib

scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)
scene_d = jax.device_put(scene)

R = 131072
key = jax.random.key(0)
uid = jnp.arange(R, dtype=jnp.int32)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.time()-t0)/n*1e3:9.2f} ms")


# A. key derivation alone
timeit("ray_keys", jax.jit(lambda: jax.random.key_data(rnglib.ray_keys(key, uid)).sum()))

# B. keys + 4x per-bounce uniform block
def rng_only():
    keys = rnglib.ray_keys(key, uid)
    acc = jnp.zeros((R,))
    for b in range(4):
        bkeys = jax.vmap(lambda k: jax.random.fold_in(k, 100 + b))(keys)
        u = rnglib.per_ray_uniform_block(bkeys, 6)
        acc = acc + u.sum(-1)
    return acc.sum()
timeit("keys + 4x fold_in + uniform_block(6)", jax.jit(rng_only))

# C. scan of 4 bounces: find_hit only (fixed rays)
org0 = jnp.tile(jnp.asarray(camera.origin, jnp.float32)[None, :], (R, 1))
d = jax.random.normal(key, (R, 3))
dirs0 = d / jnp.linalg.norm(d, axis=1, keepdims=True)
times0 = jnp.zeros((R,))

def find4(s):
    def body(c, _):
        o, dr = c
        prim, t = find_hit(s, o, dr, times0, method="pallas")
        # fake dependence to serialize bounces
        o = o + 1e-9 * t[:, None]
        return (o, dr), prim.sum()
    (_, _), ps = jax.lax.scan(body, (org0, dirs0), jnp.arange(4))
    return ps.sum()
timeit("scan 4x find_hit", jax.jit(find4), scene_d)

# D. scan 4x find + hit_data
def findhd4(s):
    def body(c, _):
        o, dr = c
        prim, t = find_hit(s, o, dr, times0, method="pallas")
        rec = hit_data(s, o, dr, times0, prim)
        o = jnp.where(rec.hit[:, None], rec.p, o)
        return (o, dr), rec.t.sum()
    (_, _), ps = jax.lax.scan(body, (org0, dirs0), jnp.arange(4))
    return ps.sum()
timeit("scan 4x find+hit_data", jax.jit(findhd4), scene_d)

# E. scan 4x find + hit_data + shade (full bounce, no rng)
uconst = jnp.full((R, 6), 0.5)
rand = {
    "unit_vector": rnglib.unit_vector_from_uniforms(uconst[..., 0], uconst[..., 1]),
    "unit_ball": rnglib.in_unit_sphere_from_uniforms(uconst[..., 2], uconst[..., 3], uconst[..., 4]),
    "uniform": uconst[..., 5],
}
def full4(s):
    def body(c, _):
        o, dr = c
        prim, t = find_hit(s, o, dr, times0, method="pallas")
        rec = hit_data(s, o, dr, times0, prim)
        samp = shade(s, rec, dr, rand)
        o = jnp.where(rec.hit[:, None], rec.p, o)
        dr = jnp.where(rec.hit[:, None], samp.direction, dr)
        return (o, dr), samp.attenuation.sum()
    (_, _), ps = jax.lax.scan(body, (org0, dirs0), jnp.arange(4))
    return ps.sum()
timeit("scan 4x find+hit_data+shade (no rng)", jax.jit(full4), scene_d)

# F. the real trace_rays
from sexy_raytracer_tpu.render.integrator import trace_rays
keys = rnglib.ray_keys(key, uid)
bg = jnp.asarray(cfg.background, jnp.float32)
timeit(
    "trace_rays (real)",
    jax.jit(lambda s: trace_rays(s, org0, dirs0, times0, keys, bg, 4, "pallas").sum()),
    scene_d,
)
