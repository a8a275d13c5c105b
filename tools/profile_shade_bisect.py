"""Bisect which part of shade() costs 42ms inside the bounce loop."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.models.scene import MAT_DIELECTRIC, MAT_LIGHT, MAT_METAL, MAT_PBR
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.ops.intersect import find_hit, hit_data
from sexy_raytracer_tpu.ops import shade as shmod
from sexy_raytracer_tpu.ops.shade import ScatterSample, material_packs, _sample_pack, _shade_pbr, _shade_metal, _shade_dielectric
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


def shade_variant(scene, rec, ray_dir, rand, *, do_pack, do_pbr, do_metal, do_diel):
    mat_f, mat_i = material_packs(scene)
    gf = table_lookup(mat_f, rec.mat_id)
    gi = table_lookup(mat_i, rec.mat_id)
    mat = {
        "base_color": gf[:, 0:4], "metallic": gf[:, 4], "roughness": gf[:, 5],
        "fuzz": gf[:, 6], "ior": gf[:, 7], "albedo_c0": gf[:, 8:11],
        "albedo_c1": gf[:, 11:14], "emit_rgb": gf[:, 14:17],
        "type": gi[:, 0], "albedo_kind": gi[:, 1], "has_normal": gi[:, 2],
        "has_metal": gi[:, 3], "has_rough": gi[:, 4], "pack_layer": gi[:, 5],
        "pack_w": gi[:, 6], "pack_h": gi[:, 7],
    }
    mtype = mat["type"]
    if do_pack:
        pack = _sample_pack(scene, mat, rec.uv)
    else:
        pack = jnp.full((R, 8), 128.0)

    if do_pbr:
        pbr_att, pbr_dir = _shade_pbr(scene, mat, pack, rec, ray_dir, rand["unit_vector"])
    else:
        pbr_att, pbr_dir = pack[:, 0:3] * 1e-3, rand["unit_vector"]
    if do_metal:
        met_att, met_dir, met_ok = _shade_metal(mat, rec, ray_dir, rand["unit_ball"])
    else:
        met_att, met_dir, met_ok = pbr_att, pbr_dir, rec.hit
    if do_diel:
        die_att, die_dir = _shade_dielectric(mat, rec, ray_dir, rand["uniform"])
    else:
        die_att, die_dir = met_att, met_dir
    emitted = jnp.where((mtype == MAT_LIGHT)[..., None], mat["emit_rgb"], 0.0)

    def sel(mask, a, b):
        return jnp.where(mask[..., None] if a.ndim > 1 else mask, a, b)
    att = sel(mtype == MAT_PBR, pbr_att, jnp.zeros_like(pbr_att))
    att = sel(mtype == MAT_METAL, met_att, att)
    att = sel(mtype == MAT_DIELECTRIC, die_att, att)
    direction = sel(mtype == MAT_PBR, pbr_dir, ray_dir)
    direction = sel(mtype == MAT_METAL, met_dir, direction)
    direction = sel(mtype == MAT_DIELECTRIC, die_dir, direction)
    scattered = jnp.where(mtype == MAT_PBR, True, False)
    scattered = jnp.where(mtype == MAT_METAL, met_ok, scattered)
    scattered = jnp.where(mtype == MAT_DIELECTRIC, True, scattered)
    return ScatterSample(att, emitted, direction, scattered & rec.hit)


def make_trace(**sv):
    def bounce(carry, bounce_idx):
        org_, dir_, thr, rad, alive = carry
        prim, _t = find_hit(scene, org_, dir_, times, method="auto")
        rec = hit_data(scene, org_, dir_, times, prim)
        bkeys = jax.vmap(lambda k: jax.random.fold_in(k, 100 + bounce_idx))(keys)
        u6 = rnglib.per_ray_uniform_block(bkeys, 6)
        rand = {
            "unit_vector": rnglib.unit_vector_from_uniforms(u6[..., 0], u6[..., 1]),
            "unit_ball": rnglib.in_unit_sphere_from_uniforms(u6[..., 2], u6[..., 3], u6[..., 4]),
            "uniform": u6[..., 5],
        }
        samp = shade_variant(scene, rec, dir_, rand, **sv)
        miss = alive & ~rec.hit
        rad = rad + jnp.where(miss[..., None], thr * background, 0.0)
        rad = rad + jnp.where((alive & rec.hit)[..., None], thr * samp.emitted, 0.0)
        alive_next = alive & rec.hit & samp.scattered
        thr = jnp.where(alive_next[..., None], thr * samp.attenuation, thr)
        org2 = jnp.where(alive_next[..., None], rec.p, org_)
        dir2 = jnp.where(alive_next[..., None], samp.direction, dir_)
        return (org2, dir2, thr, rad, alive_next), None

    def run():
        init = (org, dirs, jnp.ones((R, 3)), jnp.zeros((R, 3)), jnp.ones((R,), bool))
        (_, _, _, rad, _), _ = jax.lax.scan(bounce, init, jnp.arange(4, dtype=jnp.int32))
        return rad
    return jax.jit(run)


timeit("all on", make_trace(do_pack=True, do_pbr=True, do_metal=True, do_diel=True))
timeit("no pack", make_trace(do_pack=False, do_pbr=True, do_metal=True, do_diel=True))
timeit("no pbr", make_trace(do_pack=True, do_pbr=False, do_metal=True, do_diel=True))
timeit("no metal", make_trace(do_pack=True, do_pbr=True, do_metal=False, do_diel=True))
timeit("no dielectric", make_trace(do_pack=True, do_pbr=True, do_metal=True, do_diel=False))
timeit("pack only", make_trace(do_pack=True, do_pbr=False, do_metal=False, do_diel=False))
timeit("none", make_trace(do_pack=False, do_pbr=False, do_metal=False, do_diel=False))
