#!/usr/bin/env python
"""Large-scene crossover benchmark: resident Pallas kernel vs BVH traversal.

Builds synthetic scenes by tiling the Master Chief mesh into a GxG grid
(3,042 triangles per copy) and times ``find_hit`` per method at each size
on the current backend. Writes artifacts/bigscene_crossover.json — the
measurement behind ``method="auto"``'s size dispatch
(ops/intersect.py PALLAS_RESIDENT_MAX_TRIS).

    python tools/profile_bigscene.py            # TPU (or current backend)
    JAX_PLATFORMS=cpu python tools/profile_bigscene.py --sizes 1 2
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def build_tiled_chief(grid: int):
    """Flagship chief mesh tiled grid x grid -> SceneData (+ghost spheres)."""
    import numpy as np

    from sexy_raytracer_tpu.models.gltf import load_gltf
    from sexy_raytracer_tpu.models.presets import default_data_dir
    from sexy_raytracer_tpu.models.scene import SceneBuilder

    b = SceneBuilder()
    base = SceneBuilder()
    load_gltf(
        os.path.join(default_data_dir(), "masterchief2-separate-xf.gltf"),
        base,
    )
    mat = b.add_pbr_material(base_color=(0.8, 0.7, 0.6, 1.0), roughness=0.5)
    for gy in range(grid):
        for gx in range(grid):
            off = np.array(
                [(gx - (grid - 1) / 2) * 4.0, 0.0, -(gy * 4.0)], np.float32
            )
            for pos, uv, idx, _ in base._tri_v:
                b.add_mesh(pos + off, uv, idx, mat)
    b.add_sphere((0.0, -1000.0, 0.0), 1000.0, mat)
    return b.build()


def time_method(scene, method, n_rays=65536, reps=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sexy_raytracer_tpu.models.presets import _flagship_camera
    from sexy_raytracer_tpu.ops.intersect import find_hit
    from sexy_raytracer_tpu.render.camera import Camera
    from sexy_raytracer_tpu.render.renderer import tile_pixel_order

    W, H = 1280, 720
    cam = Camera.from_config(_flagship_camera(), W / H)
    order = tile_pixel_order(W, H)
    # keep tile coherence (the kernel's cull depends on it) but use only
    # below-horizon rows so every ray can hit geometry/ground
    order = order[order // W >= H // 2][:n_rays]
    u = jnp.asarray((order % W) + 0.5) / (W - 1)
    v = jnp.asarray(H - order // W + 0.5) / (H - 1)
    lens = jnp.full((n_rays, 3), 0.5, jnp.float32)
    org, dirs, times = cam.get_rays(u, v, lens)

    f = jax.jit(lambda s, o, d, t: find_hit(s, o, d, t, method=method))
    prim, t = f(scene, org, dirs, times)
    np.asarray(prim)  # compile + settle
    t0 = time.time()
    for _ in range(reps):
        prim, t = f(scene, org, dirs, times)
    hits = int(np.asarray(prim >= 0).sum())  # forces the stream
    dt = (time.time() - t0) / reps
    return dt, hits


def run_cell(grid: int, method: str, n_rays: int) -> dict:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    scene = build_tiled_chief(grid)
    dt, hits = time_method(scene, method, n_rays=n_rays)
    return {"seconds": round(dt, 4), "hits": hits,
            "mrays_per_s": round(n_rays / dt / 1e6, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[1, 3, 6, 10, 18])
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--cell", nargs=2, default=None,
                    help="(internal) grid method — run one cell and print")
    args = ap.parse_args()

    if args.cell:
        print("CELL " + json.dumps(
            run_cell(int(args.cell[0]), args.cell[1], args.rays)
        ), flush=True)
        return

    import subprocess

    import jax

    from sexy_raytracer_tpu.ops.intersect import PALLAS_RESIDENT_MAX_TRIS

    rows = []
    for g in args.sizes:
        T = 3042 * g * g
        row = {"grid": g, "triangles": T}
        for method in ("pallas", "bvh"):
            if method == "pallas" and T > PALLAS_RESIDENT_MAX_TRIS:
                row[method] = None  # VMEM-resident pack cannot fit
                continue
            # one subprocess per cell: the BVH while-loop traversal can
            # fault the TPU worker (observed on the axon backend), which
            # poisons the whole client process — isolate so the sweep
            # records the fault and continues
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--cell", str(g), method, "--rays", str(args.rays)],
                    capture_output=True, text=True, timeout=1200,
                )
                lines = [l for l in r.stdout.splitlines()
                         if l.startswith("CELL ")]
                if lines:
                    row[method] = json.loads(lines[-1][5:])
                else:
                    tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
                    row[method] = {"error": " | ".join(tail)[:300]}
            except subprocess.TimeoutExpired:
                row[method] = {"error": "timeout"}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "backend": jax.default_backend(),
        "n_rays": args.rays,
        "resident_limit_tris": PALLAS_RESIDENT_MAX_TRIS,
        "rows": rows,
    }
    path = os.path.join(REPO, "artifacts", "bigscene_crossover.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
