#!/usr/bin/env python
"""Honest component timing of the flagship train step on the axon TPU.

block_until_ready returns before server-side execution on this backend
(measured: "ready" arrays then take minutes to device_get), so every
timing here is forced with a scalar device_get of a reduction over the
output — the only sync primitive that tells the truth.

Stages: cluster_lists, find kernel, find+hit_data, shade, full forward
trace, loss fwd, loss fwd+bwd (the bench step), histogram backward alone.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except AttributeError:
    pass

import functools

import jax.numpy as jnp
import numpy as np

from sexy_raytracer_tpu.diff.inverse import _loss_fn
from sexy_raytracer_tpu.diff.params import extract_params
from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.ops.histogram import dense_histogram
from sexy_raytracer_tpu.ops.intersect import find_hit, hit_data
from sexy_raytracer_tpu.ops.pallas_find import cluster_lists
from sexy_raytracer_tpu.ops.shade import shade
from sexy_raytracer_tpu.render.renderer import render_pixels, tile_pixel_order
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.utils import rng as rnglib

scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)
scene = jax.device_put(scene)

R = 131072
order = tile_pixel_order(cfg.width, cfg.height)
pid0 = jnp.asarray(order[: R // 4])
pid = jnp.repeat(pid0, 4)  # 4 spb, tile-coherent like the bench
keys = rnglib.ray_keys_2d(jax.random.key(1), pid,
                          jnp.tile(jnp.arange(4, dtype=jnp.int32), R // 4))
ucam = rnglib.per_ray_uniform_block(keys, 5)
x = (pid % cfg.width).astype(jnp.float32)
y = (pid // cfg.width).astype(jnp.float32)
u = (x + ucam[..., 0]) / (cfg.width - 1)
v = ((cfg.height - y) + ucam[..., 1]) / (cfg.height - 1)
org, dirs, times = camera.get_rays(u, v, ucam[..., 2:5])
background = jnp.asarray(cfg.background, jnp.float32)
t_min = jnp.full((R,), 0.001, jnp.float32)


def force(x):
    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:16]))


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    force(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return dt


jit = jax.jit

timeit("cluster_lists", jit(lambda o, d, t: cluster_lists(
    o, d, t, scene.cluster_min, scene.cluster_max)), org, dirs, t_min)
timeit("find_hit (pallas kernel incl. lists)", jit(
    lambda o, d, tm: find_hit(scene, o, d, tm, method="pallas")
), org, dirs, times)
timeit("find_hit + hit_data", jit(
    lambda o, d, tm: hit_data(
        scene, o, d, tm, find_hit(scene, o, d, tm, method="pallas")[0]
    )
), org, dirs, times)


def fwd_shade(o, d, tm):
    rec = hit_data(scene, o, d, tm,
                   find_hit(scene, o, d, tm, method="pallas")[0])
    un = rnglib.per_ray_uniform_block(keys, 6)
    rand = {
        "unit_vector": rnglib.unit_vector_from_uniforms(un[..., 0], un[..., 1]),
        "unit_ball": rnglib.in_unit_sphere_from_uniforms(
            un[..., 2], un[..., 3], un[..., 4]),
        "uniform": un[..., 5],
    }
    return shade(scene, rec, d, rand)


timeit("find + hit_data + shade (1 bounce)", jit(fwd_shade), org, dirs, times)

fwd = jit(functools.partial(
    render_pixels, width=cfg.width, height=cfg.height, spb=4,
    spp_total=cfg.samples_per_pixel, max_bounce=4, method="pallas"))
timeit("full fwd trace (4 bounces, 131k paths)", fwd,
       scene, camera, pid0, jnp.int32(0), jax.random.key(0), background)

params = extract_params(scene)
tgt = jnp.full((R // 4, 3), 0.5)
loss_kw = dict(width=cfg.width, height=cfg.height, spb=4,
               spp_total=cfg.samples_per_pixel, max_bounce=4, method="pallas")
lf = functools.partial(_loss_fn, **loss_kw)
args = (scene, camera, pid0, tgt, jnp.int32(0), jax.random.key(0), background)
timeit("loss fwd", jit(lambda p: lf(p, *args)), params)
timeit("loss fwd+bwd (bench step sans optimizer)",
       jit(lambda p: jax.grad(lf)(p, *args)), params)

# histogram backward in isolation (shade-atlas-sized)
Hn = int(np.prod(scene.shade_atlas.shape[:3]))
idx = jax.random.randint(jax.random.key(2), (R,), 0, Hn // 50)
vals = jnp.ones((R, 8), jnp.float32)
timeit(f"dense_histogram {R}x8 -> {Hn}", jit(
    lambda i, vv: dense_histogram(i, vv, Hn)), idx, vals)
