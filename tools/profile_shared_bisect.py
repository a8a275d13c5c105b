"""Bisect the shared shade-block structure: lookups vs feedback vs updates."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.ops.intersect import find_hit, hit_data
from sexy_raytracer_tpu.ops.shade import material_packs
from sexy_raytracer_tpu.ops.lookup import table_lookup
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


def timeit(name, fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:56s} {(time.time()-t0)/n*1e3:9.2f} ms")


def make_trace(matlookup, dirfeedback, alivefb, radthr):
    def bounce(carry, bounce_idx):
        org_, dir_, thr, rad, alive = carry
        prim, _t = find_hit(scene, org_, dir_, times, method="auto")
        rec = hit_data(scene, org_, dir_, times, prim)
        bkeys = jax.vmap(lambda k: jax.random.fold_in(k, 100 + bounce_idx))(keys)
        u6 = rnglib.per_ray_uniform_block(bkeys, 6)
        unit_vec = rnglib.unit_vector_from_uniforms(u6[..., 0], u6[..., 1])

        if matlookup:
            mat_f, mat_i = material_packs(scene)
            gf = table_lookup(mat_f, rec.mat_id)
            gi = table_lookup(mat_i, rec.mat_id)
            emit = gf[:, 14:17]
            att = gf[:, 0:3]
            scattered = gi[:, 0] < 3
        else:
            emit = jnp.zeros((R, 3))
            att = jnp.full((R, 3), 0.8)
            scattered = rec.hit

        direction = unit_vec + rec.normal
        if radthr:
            miss = alive & ~rec.hit
            rad = rad + jnp.where(miss[..., None], thr * background, 0.0)
            rad = rad + jnp.where((alive & rec.hit)[..., None], thr * emit, 0.0)
        alive_next = (alive & rec.hit & scattered) if alivefb else alive
        if radthr:
            thr = jnp.where(alive_next[..., None], thr * att, thr)
        org2 = jnp.where(rec.hit[..., None], rec.p, org_)
        dir2 = jnp.where(alive_next[..., None], direction, dir_) if dirfeedback else dir_
        rad = rad + 1e-12 * direction + 1e-12 * att  # keep all live
        return (org2, dir2, thr, rad, alive_next), None

    def run():
        init = (org, dirs, jnp.ones((R, 3)), jnp.zeros((R, 3)), jnp.ones((R,), bool))
        (_, _, _, rad, _), _ = jax.lax.scan(bounce, init, jnp.arange(4, dtype=jnp.int32))
        return rad
    return jax.jit(run)


timeit("all (lookup+dirfb+alivefb+radthr)", make_trace(True, True, True, True))
timeit("no matlookup", make_trace(False, True, True, True))
timeit("no dir feedback", make_trace(True, False, True, True))
timeit("no alive feedback", make_trace(True, True, False, True))
timeit("no rad/thr updates", make_trace(True, True, True, False))
timeit("none of them", make_trace(False, False, False, False))
timeit("dir feedback only", make_trace(False, True, False, False))
