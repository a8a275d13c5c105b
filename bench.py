#!/usr/bin/env python
"""Headline benchmark: Mrays/s/chip forward+backward, 720p Master Chief.

Runs the differentiable render step (forward trace + pixel-MSE + backward
through shading/hit-data, hit finding via the Pallas kernel) on the flagship
scene (reference main.cpp:54-154: Master Chief mesh + checker ground + HDR
light + iron + mirror spheres) at 720p and reports traced rays per second.

Ray accounting: rays = paths * max_bounce (4, reference main.cpp:180) —
the fixed-depth wavefront traces every bounce slot, matching the
upper-bound accounting in SURVEY §6.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md), so the denominator is a documented estimate of its
single-thread CPU speed: ~2.0 Mray-casts/s (Shirley-style single-threaded
C++ tracers on modern x86; consistent with the flagship's ~2.3e10 casts
taking hours).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

REF_BASELINE_MRAYS = 2.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:
        pass

    from sexy_raytracer_tpu.diff.inverse import (
        TrainState,
        make_train_step,
        sample_tile_ids,
    )
    from sexy_raytracer_tpu.diff.params import extract_params
    from sexy_raytracer_tpu.models import presets
    from sexy_raytracer_tpu.parallel.mesh import make_mesh, replicate_scene, shard_rays
    from sexy_raytracer_tpu.render.camera import Camera

    scene, cfg = presets.masterchief()
    camera = Camera.from_config(cfg.camera, cfg.aspect)

    mesh = make_mesh()  # all local devices on the ray axis
    n_dev = len(jax.devices())

    spb = 4
    pixels = 32768  # 131072 paths per step per device group
    optimizer = optax.adam(1e-3)
    params = extract_params(scene)
    state = TrainState(params, optimizer.init(params), jnp.int32(0))
    step = make_train_step(mesh, cfg, optimizer, spb=spb, method="auto")

    scene_r = replicate_scene(scene, mesh)
    # random screen tiles — the realistic inverse-rendering batch shape
    # (spatially coherent blocks; see diff/inverse.py sample_tile_ids)
    rng = np.random.default_rng(0)
    ids = sample_tile_ids(rng, cfg.width, cfg.height, pixels)
    pix = shard_rays(jnp.asarray(ids), mesh)
    tgt = shard_rays(jnp.full((pixels, 3), 0.5, jnp.float32), mesh)

    # warmup / compile. Two steps: the first sees host-backed state and
    # compiles once; its output state is device-resident/sharded, which is
    # a different input signature -> second compile. Timing must start
    # only once the steady-state signature is compiled.
    state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(0))
    _ = float(loss)
    state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(0))
    _ = float(loss)

    n_steps = 8
    t0 = time.time()
    for i in range(n_steps):
        state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(i + 1))
    _ = float(loss)  # forces completion of the whole stream
    dt = time.time() - t0

    paths = pixels * spb * n_steps
    rays = paths * cfg.max_bounce
    mrays_per_s = rays / dt / 1e6
    mrays_per_chip = mrays_per_s / n_dev

    print(
        json.dumps(
            {
                "metric": "mrays_per_s_per_chip_fwd_bwd_720p_masterchief",
                "value": round(mrays_per_chip, 3),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays_per_chip / REF_BASELINE_MRAYS, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
