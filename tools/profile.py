#!/usr/bin/env python
"""Unified TPU profiling tool (consolidates the round-1..4 profile_* zoo).

Subcommands:
  step        component timings of the flagship train step (find / hit_data
              / shade / fwd trace / loss fwd / loss fwd+bwd), on the BENCH
              ray distribution (random screen tiles — ordered tiles
              understate find cost ~2x because top-of-image rays mostly
              miss into the sky)
  xplane      jax.profiler trace of the full bench step; per-op device
              times + op count (wall ~= device + ~4.3 us/op dispatch on
              this backend)
  histogram   direct-vs-sorted dense_histogram A/B at bench sizes
  bigscene    find-hit throughput sweep over scene size (clustered
              resident kernel vs streamed supercluster kernel), each size
              in a subprocess so a TPU fault costs one point

Usage: python tools/profile.py <subcommand> [--json]
"""
import argparse
import functools
import glob
import gzip
import json
import os
import subprocess
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))


def _init_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:
        pass
    return jax


def _force(x):
    import jax
    import jax.numpy as jnp

    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:16]))


def _timeit(name, fn, *args, n=10):
    out = fn(*args)
    _force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _force(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:46s} {dt:9.2f} ms", flush=True)
    return dt


def _bench_inputs():
    """The bench workload: flagship scene, 131072 random-tile paths."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sexy_raytracer_tpu.diff.inverse import sample_tile_ids
    from sexy_raytracer_tpu.models import presets
    from sexy_raytracer_tpu.render.camera import Camera
    from sexy_raytracer_tpu.utils import rng as rnglib

    scene, cfg = presets.masterchief()
    camera = Camera.from_config(cfg.camera, cfg.aspect)
    scene = jax.device_put(scene)
    spb = 4
    pixels = 32768
    ids = sample_tile_ids(np.random.default_rng(0), cfg.width, cfg.height,
                          pixels)
    pid = jnp.repeat(jnp.asarray(ids), spb)
    sid = jnp.tile(jnp.arange(spb, dtype=jnp.int32), pixels)
    keys = rnglib.ray_keys_2d(jax.random.key(1), pid, sid)
    ucam = rnglib.per_ray_uniform_block(keys, 5)
    x = (pid % cfg.width).astype(jnp.float32)
    y = (pid // cfg.width).astype(jnp.float32)
    u = (x + ucam[..., 0]) / (cfg.width - 1)
    v = ((cfg.height - y) + ucam[..., 1]) / (cfg.height - 1)
    org, dirs, times = camera.get_rays(u, v, ucam[..., 2:5])
    return dict(scene=scene, cfg=cfg, camera=camera, pid=jnp.asarray(ids),
                keys=keys, org=org, dirs=dirs, times=times, spb=spb)


def cmd_step(args):
    jax = _init_jax()
    import jax.numpy as jnp

    from sexy_raytracer_tpu.diff.inverse import _loss_fn
    from sexy_raytracer_tpu.diff.params import extract_params
    from sexy_raytracer_tpu.ops.intersect import find_hit, hit_data
    from sexy_raytracer_tpu.ops.shade import shade
    from sexy_raytracer_tpu.utils import rng as rnglib

    w = _bench_inputs()
    scene, cfg, org, dirs, times, keys = (
        w["scene"], w["cfg"], w["org"], w["dirs"], w["times"], w["keys"])
    background = jnp.asarray(cfg.background, jnp.float32)
    jit = jax.jit

    _timeit("find_hit (pallas kernel incl. lists)", jit(
        lambda o, d, tm: find_hit(scene, o, d, tm, method="pallas")
    ), org, dirs, times)
    _timeit("find + hit_data", jit(
        lambda o, d, tm: hit_data(
            scene, o, d, tm, find_hit(scene, o, d, tm, method="pallas")[0])
    ), org, dirs, times)

    def fwd_shade(o, d, tm):
        rec = hit_data(scene, o, d, tm,
                       find_hit(scene, o, d, tm, method="pallas")[0])
        un = rnglib.per_ray_uniform_block(keys, 6)
        rand = {
            "unit_vector": rnglib.unit_vector_from_uniforms(
                un[..., 0], un[..., 1]),
            "unit_ball": rnglib.in_unit_sphere_from_uniforms(
                un[..., 2], un[..., 3], un[..., 4]),
            "uniform": un[..., 5],
        }
        return shade(scene, rec, d, rand)

    _timeit("find + hit_data + shade (1 bounce)", jit(fwd_shade),
            org, dirs, times)

    from sexy_raytracer_tpu.render.renderer import render_pixels

    fwd = jit(functools.partial(
        render_pixels, width=cfg.width, height=cfg.height, spb=w["spb"],
        spp_total=cfg.samples_per_pixel, max_bounce=4, method="auto"))
    _timeit("full fwd trace (4 bounces, 131k paths)", fwd,
            scene, w["camera"], w["pid"], jnp.int32(0), jax.random.key(0),
            background)

    params = extract_params(scene)
    tgt = jnp.full((w["pid"].shape[0], 3), 0.5)
    lf = functools.partial(
        _loss_fn, width=cfg.width, height=cfg.height, spb=w["spb"],
        spp_total=cfg.samples_per_pixel, max_bounce=4, method="auto")
    largs = (scene, w["camera"], w["pid"], tgt, jnp.int32(0),
             jax.random.key(0), background)
    _timeit("loss fwd", jit(lambda p: lf(p, *largs)), params)
    _timeit("loss fwd+bwd (bench step sans optimizer)",
            jit(lambda p: jax.grad(lf)(p, *largs)), params)


def cmd_xplane(args):
    jax = _init_jax()
    import jax.numpy as jnp
    import numpy as np
    import optax

    from sexy_raytracer_tpu.diff.inverse import (
        TrainState, make_train_step, sample_tile_ids,
    )
    from sexy_raytracer_tpu.diff.params import extract_params
    from sexy_raytracer_tpu.models import presets
    from sexy_raytracer_tpu.parallel.mesh import (
        make_mesh, replicate_scene, shard_rays,
    )
    from sexy_raytracer_tpu.render.camera import Camera

    scene, cfg = presets.masterchief()
    camera = Camera.from_config(cfg.camera, cfg.aspect)
    mesh = make_mesh()
    optimizer = optax.adam(1e-3)
    params = extract_params(scene)
    state = TrainState(params, optimizer.init(params), jnp.int32(0))
    step = make_train_step(mesh, cfg, optimizer, spb=4, method="auto")
    scene_r = replicate_scene(scene, mesh)
    ids = sample_tile_ids(np.random.default_rng(0), cfg.width, cfg.height,
                          32768)
    pix = shard_rays(jnp.asarray(ids), mesh)
    tgt = shard_rays(jnp.full((32768, 3), 0.5, jnp.float32), mesh)

    for _ in range(2):
        state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(0))
        _ = float(loss)
    t0 = time.time()
    for i in range(4):
        state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(i))
    _ = float(loss)
    print(f"steady step: {(time.time()-t0)/4*1e3:.2f} ms", flush=True)

    logdir = "/tmp/jaxtrace_step"
    os.system(f"rm -rf {logdir}")
    N = 3
    with jax.profiler.trace(logdir):
        for i in range(N):
            state, loss = step(state, scene_r, camera, pix, tgt,
                               jax.random.key(i))
        _ = float(loss)

    tj = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(tj, "rt") as fh:
        trace = json.load(fh)
    events = trace["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    import re

    fam = defaultdict(lambda: [0.0, 0])
    nops = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pids.get(e.get("pid"), ""):
            continue
        name = e.get("name", "")
        if name.startswith("jit_step"):
            continue
        base = re.sub(r"[.\d]+$", "", name) or name
        fam[base][0] += e.get("dur", 0) / 1e3
        fam[base][1] += 1
        nops += 1
    print(f"device ops/step: {nops // N}")
    for k, (d, c) in sorted(fam.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"{d/N:9.3f} ms  x{c//N:<6d} {k}")


def cmd_histogram(args):
    jax = _init_jax()
    import jax.numpy as jnp
    import numpy as np

    from sexy_raytracer_tpu.ops.histogram import (
        dense_histogram, dense_histogram_sorted,
    )

    rng = np.random.default_rng(3)
    for name, R, N, C, clustered in [
        ("atlas coherent", 131072, 524288, 8, True),
        ("atlas uniform (worst case)", 131072, 524288, 8, False),
        ("tripack", 131072, 3042, 16, True),
        ("atlas 4-bounce batch", 524288, 524288, 8, True),
    ]:
        if clustered:
            base = rng.integers(0, N // 40, size=R)
            idx = jnp.asarray((base * 37 % N).astype(np.int32))
        else:
            idx = jnp.asarray(rng.integers(0, N, size=R).astype(np.int32))
        vals = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
        _timeit(f"direct  {name}", jax.jit(
            functools.partial(dense_histogram, n_bins=N)), idx, vals)
        _timeit(f"sorted  {name}", jax.jit(
            functools.partial(dense_histogram_sorted, n_bins=N)), idx, vals)


def cmd_bigscene(args):
    """Each size in a subprocess (a TPU fault costs one point)."""
    here = os.path.dirname(os.path.abspath(__file__))
    runs = [(3042, None), (50000, None), (110000, None), (304000, None),
            (304000, "bvh"), (600000, None)]
    rows = []
    for T, method in runs:
        cmd = [sys.executable, os.path.join(here, "profile.py"),
               "_bigscene_one", "--tris", str(T)]
        if method:
            cmd += ["--method", method]
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if line:
            rows.append(json.loads(line[-1]))
            print(line[-1], flush=True)
        else:
            print(f"T={T}: FAILED\n{r.stdout[-500:]}\n{r.stderr[-500:]}",
                  flush=True)
    out = os.path.join(os.path.dirname(here), "artifacts",
                       "bigscene_crossover.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {out}")


def cmd_bigscene_one(args):
    """One scene size: a tessellated terrain heightfield rendered by a
    camera — the representative 'big mesh' workload (coherent primary
    rays onto a surface; tile-coherent blocks form narrow frustums the
    cull can exploit, like a real render does). A point-source ray spray
    through a triangle soup defeats every acceleration structure by
    construction and benchmarks nothing but brute force."""
    jax = _init_jax()
    import jax.numpy as jnp
    import numpy as np

    from sexy_raytracer_tpu.models import SceneBuilder
    from sexy_raytracer_tpu.ops.intersect import (
        PALLAS_RESIDENT_MAX_TRIS, find_hit,
    )
    from sexy_raytracer_tpu.render.renderer import tile_pixel_order

    T = args.tris
    n = int(np.sqrt(T / 2.0))          # n x n quad grid -> 2 n^2 tris
    xs = np.linspace(-30, 30, n + 1)
    zs = np.linspace(-30, 30, n + 1)
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    Y = 2.0 * np.sin(X * 0.4) * np.cos(Z * 0.3) + 0.5 * np.sin(X * 1.7)
    verts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    a = (ii * (n + 1) + jj).ravel()
    bqd = a + 1
    c = a + (n + 1)
    d = c + 1
    idx = np.concatenate(
        [np.stack([a, bqd, c], 1), np.stack([bqd, d, c], 1)]
    )
    b = SceneBuilder()
    m = b.add_pbr_material(base_color=(0.5, 0.5, 0.5, 1.0))
    b.add_mesh(verts, None, idx, m)
    scene = jax.device_put(b.build(build_bvh=True))
    T_actual = int(scene.tri_v0.shape[0])

    # pinhole camera above the terrain, tile-coherent ray order
    W, H = 320, 204
    order = tile_pixel_order(W, H)
    px = (order % W).astype(np.float32)
    py = (order // W).astype(np.float32)
    u = (px + 0.5) / W - 0.5
    v = (py + 0.5) / H - 0.5
    eye = np.array([0.0, 18.0, 42.0], np.float32)
    fwd = np.array([0.0, -0.45, -1.0])
    fwd /= np.linalg.norm(fwd)
    right = np.array([1.0, 0.0, 0.0])
    up = np.cross(right, fwd)
    d3 = (fwd[None] + 1.3 * u[:, None] * right[None]
          + 1.3 * 0.64 * v[:, None] * up[None]).astype(np.float32)
    R = d3.shape[0]
    org = jnp.asarray(np.tile(eye[None], (R, 1)))
    dirs = jnp.asarray(d3)
    times = jnp.zeros((R,), jnp.float32)

    method = args.method or (
        "pallas" if T_actual <= PALLAS_RESIDENT_MAX_TRIS else "streamed"
    )
    fn = jax.jit(lambda o, dd, tt: find_hit(scene, o, dd, tt, method=method))
    out = fn(org, dirs, times)
    _force(out)
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        out = fn(org, dirs, times)
    _force(out)
    dt = (time.time() - t0) / reps
    hits = int(jnp.sum(out[0] >= 0))
    print(json.dumps({
        "tris": T_actual, "method": method, "rays": R,
        "find_ms": round(dt * 1e3, 2),
        "mrays_per_s": round(R / dt / 1e6, 3), "hits": hits,
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["step", "xplane", "histogram", "bigscene",
                                   "_bigscene_one"])
    p.add_argument("--tris", type=int, default=304000)
    p.add_argument("--method", default=None)
    args = p.parse_args()
    {
        "step": cmd_step,
        "xplane": cmd_xplane,
        "histogram": cmd_histogram,
        "bigscene": cmd_bigscene,
        "_bigscene_one": cmd_bigscene_one,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
