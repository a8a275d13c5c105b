#!/usr/bin/env python
"""Dump the REAL gather indices the backward pass scatters into, per bounce,
for a bench-shaped wavefront (random screen tiles on the flagship scene).

CPU-only; writes /tmp/bwd_indices.npz with atlas flat ids + winning tri ids
per bounce. Used to size the direct histogram kernel's (chunk, window)
worklist (tools/eval_histogram_locality.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sexy_raytracer_tpu.diff.inverse import sample_tile_ids
from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.ops.intersect import T_MIN_DEFAULT, find_hit, hit_data
from sexy_raytracer_tpu.ops.shade import material_packs, shade
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.utils import rng as rnglib

scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)

spb = 4
pixels = 32768
rng = np.random.default_rng(0)
ids = sample_tile_ids(rng, cfg.width, cfg.height, pixels)
pid = jnp.repeat(jnp.asarray(ids), spb)
R = pid.shape[0]
sid = jnp.tile(jnp.arange(spb, dtype=jnp.int32), pixels)
keys = rnglib.ray_keys_2d(jax.random.key(1), pid, sid)
ucam = rnglib.per_ray_uniform_block(keys, 5)
x = (pid % cfg.width).astype(jnp.float32)
y = (pid // cfg.width).astype(jnp.float32)
u = (x + ucam[..., 0]) / (cfg.width - 1)
v = ((cfg.height - y) + ucam[..., 1]) / (cfg.height - 1)
org, dirs, times = camera.get_rays(u, v, ucam[..., 2:5])

out = {}
alive = jnp.ones((R,), bool)
for bounce in range(cfg.max_bounce):
    t_min = jnp.where(alive, T_MIN_DEFAULT, 3.0e38)
    prim, _ = find_hit(scene, org, dirs, times, t_min=t_min, method="bruteforce")
    rec = hit_data(scene, org, dirs, times, prim)

    # the atlas flat index exactly as ops/shade._sample_pack computes it
    mat_f, mat_i = material_packs(scene)
    gi = mat_i[rec.mat_id]
    L, H, W, C = scene.shade_atlas.shape
    layer = jnp.maximum(gi[:, 5], 0)
    w_ = gi[:, 6]
    h_ = gi[:, 7]
    uu = jnp.clip(rec.uv[..., 0], 0.0, 1.0)
    vv = 1.0 - jnp.clip(rec.uv[..., 1], 0.0, 1.0)
    xi = jnp.minimum((uu * w_).astype(jnp.int32), w_ - 1)
    yj = jnp.minimum((vv * h_).astype(jnp.int32), h_ - 1)
    flat = (layer * H + yj) * W + xi

    T = scene.tri_v0.shape[0]
    tri_id = jnp.where(alive & rec.hit & (prim < T), jnp.where(prim >= 0, prim, 0), 0)

    out[f"atlas_b{bounce}"] = np.asarray(flat, np.int32)
    out[f"tri_b{bounce}"] = np.asarray(tri_id, np.int32)
    out[f"alive_b{bounce}"] = np.asarray(alive & rec.hit)

    bkeys = jax.vmap(lambda k: jax.random.fold_in(k, 100 + bounce))(keys)
    u6 = rnglib.per_ray_uniform_block(bkeys, 6)
    rand = {
        "unit_vector": rnglib.unit_vector_from_uniforms(u6[..., 0], u6[..., 1]),
        "unit_ball": rnglib.in_unit_sphere_from_uniforms(
            u6[..., 2], u6[..., 3], u6[..., 4]),
        "uniform": u6[..., 5],
    }
    samp = shade(scene, rec, dirs, rand)
    alive = alive & rec.hit & samp.scattered
    org = jnp.where(alive[:, None], rec.p, org)
    dirs = jnp.where(alive[:, None], samp.direction, dirs)
    print(f"bounce {bounce}: alive {int(alive.sum())}/{R}", flush=True)

out["n_bins_atlas"] = np.int64(L * H * W)
out["n_bins_tri"] = np.int64(T)
np.savez("/tmp/bwd_indices.npz", **out)
print("saved /tmp/bwd_indices.npz")
