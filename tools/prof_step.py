"""Per-op device-time breakdown of the flagship train step (round 5).

Builds the exact bench.py train-step configuration (32768 pixels x spb 4 =
131072 paths, fused path, method auto) and prints the top device ops, so
the ~6 ms "per-bounce glue" tail (README perf section) gets names.

Usage: python tools/prof_step.py [top_n]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from sexy_raytracer_tpu.diff.inverse import (
        TrainState,
        make_train_step,
        sample_tile_ids,
    )
    from sexy_raytracer_tpu.diff.params import extract_params
    from sexy_raytracer_tpu.models import presets
    from sexy_raytracer_tpu.parallel.mesh import (
        make_mesh,
        replicate_scene,
        shard_rays,
    )
    from sexy_raytracer_tpu.render.camera import Camera
    from tools.tputime import op_breakdown, device_time

    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    scene, cfg = presets.masterchief()
    camera = Camera.from_config(cfg.camera, cfg.aspect)
    mesh = make_mesh()

    spb = 4
    pixels = 32768
    optimizer = optax.adam(1e-3)
    params = extract_params(scene)
    from sexy_raytracer_tpu.render.integrator import scene_no_emissive_tris
    step = make_train_step(mesh, cfg, optimizer, spb=spb, method="auto",
                           last_bounce_vis=scene_no_emissive_tris(scene))
    state = step.init(params)

    scene_r = replicate_scene(scene, mesh)
    rng = np.random.default_rng(0)
    ids = sample_tile_ids(rng, cfg.width, cfg.height, pixels)
    pix = shard_rays(jnp.asarray(ids), mesh)
    tgt = shard_rays(jnp.full((pixels, 3), 0.5, jnp.float32), mesh)

    # steady-state signature: run two steps first (see bench.py comment)
    state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(0))
    _ = float(loss)

    def run(state):
        st, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(1))
        return next(iter(st.params.values())), loss

    device_time("train_step(131k paths, spb 4)", run, [(state,)], n=6)
    op_breakdown(run, [(state,)], n=6, top=top_n)


if __name__ == "__main__":
    main()
