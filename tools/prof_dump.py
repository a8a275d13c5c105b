"""Dump the TPU trace of one train step with track names, so container
events and per-op events can be told apart. Usage: python tools/prof_dump.py
"""
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

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
    spb, pixels = 4, 32768
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

    state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(0))
    _ = float(loss)
    state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(0))
    _ = float(loss)

    logdir = tempfile.mkdtemp(prefix="profdump_")
    n = 4
    with jax.profiler.trace(logdir):
        st = state
        for i in range(n):
            st, loss = step(st, scene_r, camera, pix, tgt, jax.random.key(i))
        _ = float(loss)

    tj = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(tj, "rt") as fh:
        trace = json.load(fh)
    events = trace["traceEvents"]
    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")

    agg = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e.get("pid"), "")
        if "TPU" not in pname:
            continue
        tname = tids.get((e.get("pid"), e.get("tid")), str(e.get("tid")))
        agg[(tname, e.get("name", ""))][0] += e.get("dur", 0) / 1e3
        agg[(tname, e.get("name", ""))][1] += 1

    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:70]
    for (tname, name), (dur, cnt) in rows:
        print(f"{dur / n:9.3f} ms  x{cnt // n:<4d} [{tname[:28]:28s}] {name[:90]}")




def dump_hlo():
    """Write the optimized HLO of the train step to /tmp/step_hlo.txt."""
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

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
    spb, pixels = 4, 32768
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
    state, loss = step(state, scene_r, camera, pix, tgt, jax.random.key(0))
    _ = float(loss)
    lowered = jax.jit(step).lower(
        state, scene_r, camera, pix, tgt, jax.random.key(0))
    txt = lowered.compile().as_text()
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(txt)
    print(f"wrote /tmp/step_hlo.txt ({len(txt)} bytes)")


if __name__ == "__main__" and "--hlo" in sys.argv:
    dump_hlo()
elif __name__ == "__main__":
    main()
