"""Real multi-process jax.distributed CI test (VERDICT r3 missing #1).

Launches 2 OS processes x 2 local CPU devices (localhost coordinator) that
build one 4-device global mesh through ``parallel.mesh.init_distributed``
and run the SPMD train step + sharded render with per-process addressable
shards only (``jax.make_array_from_process_local_data``). Asserts:

* both processes see identical losses (the gradient psum crosses the
  process boundary) and identical render sums;
* the losses match a single-process 4-device run of the *same global
  batch* in this test process — the multi-process data path is exact, not
  merely self-consistent.

The reference has no distributed anything (SURVEY §2); this subsystem is
original design, and this test is its process-boundary proof.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(out: str, tag: str):
    vals = []
    for line in out.splitlines():
        if line.startswith(tag + " "):
            vals.append(line.split()[-1])
    return vals


def test_multiprocess_train_and_render():
    nproc = 2
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(_WORKER))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses = [_parse(o, "LOSS") for o in outs]
    rsums = [_parse(o, "RSUM") for o in outs]
    assert len(losses[0]) == 2 and len(rsums[0]) == 1
    # identical across processes (collectives crossed the boundary)
    assert losses[0] == losses[1], (losses, outs)
    assert rsums[0] == rsums[1], (rsums, outs)

    # exactness: same global batch on a single-process 4-device mesh
    import jax.numpy as jnp
    import optax

    from sexy_raytracer_tpu.diff.inverse import TrainState, make_train_step
    from sexy_raytracer_tpu.diff.params import extract_params
    from sexy_raytracer_tpu.models import SceneBuilder
    from sexy_raytracer_tpu.parallel.mesh import (
        make_mesh, replicate_scene, shard_rays,
    )
    from sexy_raytracer_tpu.render.camera import Camera
    from sexy_raytracer_tpu.utils.config import CameraConfig, RenderConfig

    b = SceneBuilder()
    checker = b.add_checker_texture((0.2, 0.3, 0.1), (0.9, 0.9, 0.9))
    b.add_sphere((0, -1000, 0), 1000.0, b.add_pbr_material(albedo_tex=checker))
    b.add_sphere((-2, 1, 0), 1.0, b.add_light_material(color=(10, 9, 7)))
    b.add_sphere((2, 1, 0), 1.0, b.add_metal_material((0.7, 0.6, 0.5), 0.0))
    mat = b.add_pbr_material(base_color=(0.9, 0.3, 0.3, 1.0))
    b.add_mesh([[-1, 0, -2], [1, 0, -2], [0, 2, -2]], None, [[0, 1, 2]], mat)
    scene = b.build(build_bvh=False)
    cfg = RenderConfig(
        width=32, height=24, samples_per_pixel=8, max_bounce=3,
        rays_per_chunk=256, samples_per_batch=4,
        camera=CameraConfig(eye=(0, 2, 6), look_at=(0, 1, 0),
                            vfov_degrees=45.0, aperture=0.0, focus_dist=6.0),
    )
    camera = Camera.from_config(cfg.camera, cfg.aspect)
    mesh = make_mesh(n_rays=2, n_samples=2, devices=jax.devices()[:4])
    scene_r = replicate_scene(scene, mesh)
    ids = shard_rays(
        np.arange(128, dtype=np.int32) % (cfg.width * cfg.height), mesh
    )
    tgt = shard_rays(np.full((128, 3), 0.4, np.float32), mesh)
    params = extract_params(scene)
    optimizer = optax.adam(1e-3)
    state = TrainState(params, optimizer.init(params), jnp.int32(0))
    step = make_train_step(mesh, cfg, optimizer, spb=2, method="bruteforce")
    ref = []
    for _ in range(2):
        state, loss = step(state, scene_r, camera, ids, tgt, jax.random.key(7))
        ref.append(float(loss))
    got = [float(v) for v in losses[0]]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)
