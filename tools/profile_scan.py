"""Why is find_hit 0.16ms standalone but ~8.5ms inside a scan?"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.ops.intersect import find_hit

scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)
scene_d = jax.device_put(scene)

R = 131072
key = jax.random.key(0)
org0 = jnp.tile(jnp.asarray(camera.origin, jnp.float32)[None, :], (R, 1))
d = jax.random.normal(key, (R, 3))
dirs0 = d / jnp.linalg.norm(d, axis=1, keepdims=True)
times0 = jnp.zeros((R,))


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.time()-t0)/n*1e3:9.2f} ms")


f1 = jax.jit(lambda s, o, dd, t: find_hit(s, o, dd, t, method="pallas"))
timeit("standalone find_hit (n=20)", f1, scene_d, org0, dirs0, times0)

# sum-only output (rules out D2H of [R] outputs)
f1s = jax.jit(lambda s: sum(x.sum() for x in find_hit(s, org0, dirs0, times0, method="pallas")))
timeit("standalone find_hit, scalar out", f1s, scene_d)

# scan with ONE iteration
def scan1(s):
    def body(c, _):
        o, dr = c
        prim, t = find_hit(s, o, dr, times0, method="pallas")
        o = o + 1e-9 * t[:, None]
        return (o, dr), prim.sum()
    (_, _), ps = jax.lax.scan(body, (org0, dirs0), jnp.arange(1))
    return ps.sum()
timeit("scan 1x find_hit", jax.jit(scan1), scene_d)

# 4 sequential calls, no scan (unrolled)
def unroll4(s):
    o, dr = org0, dirs0
    acc = 0.0
    for _ in range(4):
        prim, t = find_hit(s, o, dr, times0, method="pallas")
        o = o + 1e-9 * t[:, None]
        acc = acc + prim.sum()
    return acc
timeit("unrolled 4x find_hit", jax.jit(unroll4), scene_d)
