"""Ablate trace_rays to find the 45ms-vs-1.7ms forward scan mystery."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.ops.intersect import find_hit, hit_data
from sexy_raytracer_tpu.ops.shade import shade
from sexy_raytracer_tpu.utils import rng as rnglib

scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)
scene = jax.device_put(scene)

R = 131072
key = jax.random.key(0)
pid = jax.random.randint(key, (R,), 0, cfg.width * cfg.height)
keys = rnglib.ray_keys(jax.random.key(1), pid)
ucam = rnglib.per_ray_uniform_block(keys, 5)
x = (pid % cfg.width).astype(jnp.float32)
y = (pid // cfg.width).astype(jnp.float32)
u = (x + ucam[..., 0]) / (cfg.width - 1)
v = ((cfg.height - y) + ucam[..., 1]) / (cfg.height - 1)
org, dirs, times = camera.get_rays(u, v, ucam[..., 2:5])
org, dirs, times, keys = map(jax.block_until_ready, (org, dirs, times, keys))
background = jnp.asarray(cfg.background, jnp.float32)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.time()-t0)/n*1e3:9.2f} ms")


def make_trace(use_scan, do_rng, do_hitdata, do_shade, method="auto"):
    def bounce(carry, bounce_idx):
        org_, dir_, thr, rad, alive = carry
        prim, _t = find_hit(scene, org_, dir_, times, method=method)
        if do_hitdata:
            rec = hit_data(scene, org_, dir_, times, prim)
        if do_rng:
            bkeys = jax.vmap(lambda k: jax.random.fold_in(k, 100 + bounce_idx))(keys)
            u6 = rnglib.per_ray_uniform_block(bkeys, 6)
            rand = {
                "unit_vector": rnglib.unit_vector_from_uniforms(u6[..., 0], u6[..., 1]),
                "unit_ball": rnglib.in_unit_sphere_from_uniforms(u6[..., 2], u6[..., 3], u6[..., 4]),
                "uniform": u6[..., 5],
            }
        else:
            z = jnp.full((R,), 0.3)
            z3 = jnp.stack([z, z, z], -1)
            rand = {"unit_vector": z3, "unit_ball": z3, "uniform": z}
        if do_shade:
            samp = shade(scene, rec, dir_, rand)
            miss = alive & ~rec.hit
            rad = rad + jnp.where(miss[..., None], thr * background, 0.0)
            rad = rad + jnp.where((alive & rec.hit)[..., None], thr * samp.emitted, 0.0)
            alive_next = alive & rec.hit & samp.scattered
            thr = jnp.where(alive_next[..., None], thr * samp.attenuation, thr)
            org2 = jnp.where(alive_next[..., None], rec.p, org_)
            dir2 = jnp.where(alive_next[..., None], samp.direction, dir_)
        else:
            if do_hitdata:
                org2 = jnp.where(rec.hit[..., None], rec.p, org_)
            else:
                org2 = org_ + 1e-9 * _t[:, None]
            dir2 = dir_
            alive_next = alive
            rad = rad + rand["unit_vector"] * 1e-9  # keep rng alive
        return (org2, dir2, thr, rad, alive_next), None

    def run():
        init = (org, dirs, jnp.ones((R, 3)), jnp.zeros((R, 3)), jnp.ones((R,), bool))
        if use_scan:
            (o, d, t, rad, a), _ = jax.lax.scan(bounce, init, jnp.arange(4, dtype=jnp.int32))
        else:
            c = init
            for i in range(4):
                c, _ = bounce(c, jnp.int32(i))
            rad = c[3]
        return rad
    return jax.jit(run)


timeit("scan  full (find+hitdata+rng+shade)", make_trace(True, True, True, True))
timeit("unroll full", make_trace(False, True, True, True))
timeit("scan  no-rng", make_trace(True, False, True, True))
timeit("scan  no-shade (find+hitdata+rng)", make_trace(True, True, True, False))
timeit("scan  find-only+rng", make_trace(True, True, False, False))
timeit("scan  find-only no-rng", make_trace(True, False, False, False))
timeit("unroll find-only no-rng", make_trace(False, False, False, False))
timeit("scan  full bruteforce method", make_trace(True, True, True, True, method="bruteforce"))
