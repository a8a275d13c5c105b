"""Component-level timing of the flagship train step on real TPU.

Ablates: find_hit alone, hit_data, shade fwd, full fwd trace, fwd+bwd,
atlas backward alone. Ground truth remains the full step (ADVICE.md).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.render.renderer import render_pixels
from sexy_raytracer_tpu.ops.intersect import find_hit, hit_data
from sexy_raytracer_tpu.ops.shade import shade
from sexy_raytracer_tpu.utils import rng as rnglib
from sexy_raytracer_tpu.diff.params import extract_params, merge_params as apply_params

scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)
scene = jax.device_put(scene)

R = 131072
key = jax.random.key(0)
pid = jax.random.randint(key, (R,), 0, cfg.width * cfg.height)
uid = pid  # one sample per pixel for profiling
keys = rnglib.ray_keys(jax.random.key(1), uid)
ucam = rnglib.per_ray_uniform_block(keys, 5)
x = (pid % cfg.width).astype(jnp.float32)
y = (pid // cfg.width).astype(jnp.float32)
u = (x + ucam[..., 0]) / (cfg.width - 1)
v = ((cfg.height - y) + ucam[..., 1]) / (cfg.height - 1)
org, dirs, times = camera.get_rays(u, v, ucam[..., 2:5])
org, dirs, times = map(jax.block_until_ready, (org, dirs, times))
background = jnp.asarray(cfg.background, jnp.float32)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:48s} {dt:9.2f} ms")
    return dt


# A. find_hit standalone (pallas), x1
f_find = jax.jit(lambda s, o, d, t: find_hit(s, o, d, t, method="auto"))
timeit("find_hit pallas x1", f_find, scene, org, dirs, times)

# B. find_hit x4 chained (dependency via org offset)
def find4(s, o, d, t):
    acc = 0.0
    for _ in range(4):
        prim, tt = find_hit(s, o, d, t, method="auto")
        o = o + 1e-9 * tt[:, None]
        acc = acc + prim.sum()
    return acc
timeit("find_hit pallas x4 chained", jax.jit(find4), scene, org, dirs, times)

# C. hit_data x1 given winners
prim, _t = jax.block_until_ready(f_find(scene, org, dirs, times))
f_hd = jax.jit(lambda s, o, d, t, p: hit_data(s, o, d, t, p))
timeit("hit_data x1", f_hd, scene, org, dirs, times, prim)

# D. shade fwd x1
rec = jax.block_until_ready(f_hd(scene, org, dirs, times, prim))
u6 = rnglib.per_ray_uniform_block(keys, 6)
rand = {
    "unit_vector": rnglib.unit_vector_from_uniforms(u6[..., 0], u6[..., 1]),
    "unit_ball": rnglib.in_unit_sphere_from_uniforms(u6[..., 2], u6[..., 3], u6[..., 4]),
    "uniform": u6[..., 5],
}
rand = jax.block_until_ready(rand)
f_sh = jax.jit(lambda s, r, d, rd: shade(s, r, d, rd))
timeit("shade fwd x1", f_sh, scene, rec, dirs, rand)

# D2. shade fwd+bwd x1 (grads to scene arrays)
params = extract_params(scene)
def shade_loss(p, s, r, d, rd):
    s2 = apply_params(s, p)
    out = shade(s2, r, d, rd)
    return (out.attenuation.sum() + out.emitted.sum())
f_shb = jax.jit(jax.grad(shade_loss))
timeit("shade fwd+bwd x1", f_shb, params, scene, rec, dirs, rand)

# E. full forward trace (render_pixels fwd only)
pix = pid.astype(jnp.int32)
f_fwd = jax.jit(lambda s, c, p: render_pixels(
    s, c, p, jnp.int32(0), jax.random.key(1), background,
    width=cfg.width, height=cfg.height, spb=1, spp_total=1,
    max_bounce=4, method="auto"))
timeit("full fwd trace x4bounce (131k paths)", f_fwd, scene, camera, pix)

# F. full fwd+bwd
tgt = jnp.full((R, 3), 0.5)
def loss_fn(p, s, c, px):
    s2 = apply_params(s, p)
    out = render_pixels(
        s2, c, px, jnp.int32(0), jax.random.key(1), background,
        width=cfg.width, height=cfg.height, spb=1, spp_total=1,
        max_bounce=4, method="auto")
    return jnp.mean((out - tgt) ** 2)
f_full = jax.jit(jax.grad(loss_fn))
timeit("full fwd+bwd x4bounce (131k paths)", f_full, params, scene, camera, pix)

# G. atlas backward alone
from sexy_raytracer_tpu.ops.lookup import atlas_lookup
L, H, W, C = scene.shade_atlas.shape
flat = jax.random.randint(key, (R,), 0, L * H * W)
# concentrated indices (worst case)
flat_conc = (flat % 1000).astype(jnp.int32)
def at_loss(a, f):
    return atlas_lookup(a.reshape(L * H, W, C), f).sum()
f_at = jax.jit(jax.grad(at_loss))
atlas = scene.shade_atlas
timeit("atlas_lookup bwd x1 (uniform idx)", f_at, atlas, flat)
timeit("atlas_lookup bwd x1 (concentrated)", f_at, atlas, flat_conc)

print(f"\natlas shape {scene.shade_atlas.shape}, tris {scene.tri_v0.shape[0]}, "
      f"spheres {scene.sph_c0.shape[0]}, mats {scene.mat_type.shape[0]}")
