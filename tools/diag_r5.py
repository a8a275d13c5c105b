#!/usr/bin/env python
"""Round-5 diagnostics: where do the train step and the frame driver spend
their time, and what would dead-lane compaction buy?

Measures, on the real chip (wall clock with device_get forcing — axon's
block_until_ready returns early):

  1. find_hit wall cost at 131072 rays for: ordered-tile primaries (the
     fwd bench's region), random-tile primaries (the train-step batch),
     whole-frame chunk primaries (rows covering ground+chief), and
     REALISTIC bounce-1/2/3 wavefronts (actual scattered rays + alive
     masks from tracing).
  2. the same bounce wavefronts with dead lanes compacted to a dense
     prefix (stable partition) — the VERDICT r4 #1 experiment.
  3. cluster_lists (the XLA-side cull) alone.
  4. one frame-driver dispatch (render_chunk, spb=1) per screen region.

Usage: python tools/diag_r5.py [--json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def force(x):
    import jax

    leaves = jax.tree.leaves(x)
    return np.asarray(leaves[0]).ravel()[:4]


def timeit(name, fn, *args, n=8, results=None):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    force(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:56s} {dt:9.2f} ms", flush=True)
    if results is not None:
        results[name] = round(dt, 3)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from sexy_raytracer_tpu.diff.inverse import sample_tile_ids
    from sexy_raytracer_tpu.models import presets
    from sexy_raytracer_tpu.ops.intersect import (
        T_MIN_DEFAULT,
        find_hit,
        hit_data,
    )
    from sexy_raytracer_tpu.ops.shade import shade
    from sexy_raytracer_tpu.render.camera import Camera
    from sexy_raytracer_tpu.render.renderer import (
        render_pixels,
        tile_pixel_order,
    )
    from sexy_raytracer_tpu.utils import rng as rnglib

    scene, cfg = presets.masterchief()
    camera = Camera.from_config(cfg.camera, cfg.aspect)
    W, H = cfg.width, cfg.height
    R = 131072
    results = {}

    order = tile_pixel_order(W, H)
    rng_np = np.random.default_rng(0)

    def primary(pids, spb=1):
        pid = jnp.repeat(jnp.asarray(pids), spb)
        sid = jnp.tile(jnp.arange(spb, dtype=jnp.int32), pids.shape[0])
        keys = rnglib.ray_keys_2d(jax.random.key(0), pid, sid)
        u5 = rnglib.per_ray_uniform_block(keys, 5)
        x = (pid % W).astype(jnp.float32)
        y = (pid // W).astype(jnp.float32)
        u = (x + u5[..., 0]) / (W - 1)
        v = ((H - y) + u5[..., 1]) / (H - 1)
        org, d, t = camera.get_rays(u, v, u5[..., 2:5])
        return org, d, t, keys

    # ray populations ------------------------------------------------------
    pops = {}
    gen_primary = jax.jit(primary, static_argnames=("spb",))
    # fwd-bench region: first 131072 ids in tile order (top of screen)
    o, d, t, k = gen_primary(order[:R])
    pops["primary_top(bench fwd)"] = (o, d, t, jnp.full((R,), T_MIN_DEFAULT))
    # train batch: random tiles over the full screen
    ids = sample_tile_ids(rng_np, W, H, R)
    o2, d2, t2, k2 = gen_primary(ids)
    pops["primary_random_tiles(train)"] = (
        o2, d2, t2, jnp.full((R,), T_MIN_DEFAULT))
    # frame middle chunk: ids covering chief + ground
    o3, d3, t3, k3 = gen_primary(order[3 * R:4 * R])
    pops["primary_mid_frame"] = (o3, d3, t3, jnp.full((R,), T_MIN_DEFAULT))

    # realistic bounce wavefronts from the train batch
    @jax.jit
    def advance(org, dir, tm, keys, bounce_idx):
        t_min = jnp.full((org.shape[0],), T_MIN_DEFAULT)
        prim, _ = find_hit(scene, org, dir, tm, t_min=t_min, method="auto")
        rec = hit_data(scene, org, dir, tm, prim)
        bkeys = jax.vmap(
            lambda kk: jax.random.fold_in(kk, 100 + bounce_idx))(keys)
        u = rnglib.per_ray_uniform_block(bkeys, 6)
        rand = {
            "unit_vector": rnglib.unit_vector_from_uniforms(
                u[..., 0], u[..., 1]),
            "unit_ball": rnglib.in_unit_sphere_from_uniforms(
                u[..., 2], u[..., 3], u[..., 4]),
            "uniform": u[..., 5],
        }
        samp = shade(scene, rec, dir, rand)
        alive = rec.hit & samp.scattered
        org2 = jnp.where(alive[..., None], rec.p, org)
        dir2 = jnp.where(alive[..., None], samp.direction, dir)
        return org2, dir2, alive

    org_b, dir_b, tm_b, keys_b = o2, d2, t2, k2
    alive_b = jnp.ones((R,), bool)
    bounce_pops = {}
    for b in range(3):
        org_b, dir_b, a = advance(org_b, dir_b, tm_b, keys_b, b)
        alive_b = alive_b & a
        frac = float(jnp.mean(alive_b.astype(jnp.float32)))
        print(f"bounce {b+1}: alive fraction {frac:.3f}", flush=True)
        results[f"alive_frac_b{b+1}"] = round(frac, 4)
        t_min = jnp.where(alive_b, T_MIN_DEFAULT, 3.0e38)
        bounce_pops[f"bounce{b+1}_wavefront"] = (
            org_b, dir_b, tm_b, t_min)

    pops.update(bounce_pops)

    # 1/2. find_hit per population, plain vs compacted ---------------------
    @jax.jit
    def find_plain(org, dir, tm, t_min):
        p, tt = find_hit(scene, org, dir, tm, t_min=t_min, method="auto")
        return p

    @jax.jit
    def find_compact(org, dir, tm, t_min):
        alive = t_min < 1e38
        na = jnp.cumsum(alive.astype(jnp.int32))
        nd = jnp.cumsum((~alive).astype(jnp.int32))
        total = na[-1]
        pos = jnp.where(alive, na - 1, total + nd - 1)
        dest = jnp.zeros((R,), jnp.int32).at[pos].set(
            jnp.arange(R, dtype=jnp.int32))
        p, tt = find_hit(
            scene, org[dest], dir[dest], tm[dest], t_min=t_min[dest],
            method="auto")
        return p[pos]

    for name, (org, dir, tm, t_min) in pops.items():
        timeit(f"find[{name}]", find_plain, org, dir, tm, t_min,
               results=results)
    for name, (org, dir, tm, t_min) in bounce_pops.items():
        a = timeit(f"find_compacted[{name}]", find_compact, org, dir, tm,
                   t_min, results=results)
        # verify equality
        pa = find_plain(org, dir, tm, t_min)
        pb = find_compact(org, dir, tm, t_min)
        mism = int(jnp.sum(pa != pb))
        print(f"  compaction parity: {mism} mismatches", flush=True)
        results[f"compact_parity[{name}]"] = mism

    # 3. cull alone --------------------------------------------------------
    from sexy_raytracer_tpu.ops.pallas_find import cluster_lists

    @jax.jit
    def cull_only(org, dir, t_min):
        return cluster_lists(
            org, dir, t_min,
            jax.lax.stop_gradient(scene.cluster_min),
            jax.lax.stop_gradient(scene.cluster_max))

    for name in ("primary_random_tiles(train)", "bounce2_wavefront"):
        org, dir, tm, t_min = pops[name]
        timeit(f"cluster_lists[{name}]", cull_only, org, dir, t_min,
               results=results)
        lists = cull_only(org, dir, t_min)
        cnt = np.asarray(lists[:, 0])
        print(f"  active clusters/block: mean {cnt.mean():.1f} "
              f"max {cnt.max()} blocks {cnt.shape[0]}", flush=True)
        results[f"cull_mean_active[{name}]"] = round(float(cnt.mean()), 2)

    # 4. frame-driver dispatch per region (spb=1, fused path) --------------
    import functools

    fwd = jax.jit(functools.partial(
        render_pixels, width=W, height=H, spb=1,
        spp_total=cfg.samples_per_pixel, max_bounce=cfg.max_bounce,
        method="auto",
    ))
    bg = jnp.asarray(cfg.background, jnp.float32)
    key = jax.random.key(0)
    for i, name in [(0, "top"), (3, "mid"), (6, "bottom")]:
        fpix = jnp.asarray(order[i * R:(i + 1) * R])
        timeit(f"frame_dispatch[{name}]", fwd, scene, camera, fpix,
               jnp.int32(0), key, bg, n=4, results=results)

    if "--json" in sys.argv:
        with open("/tmp/diag_r5.json", "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(results))


if __name__ == "__main__":
    main()
