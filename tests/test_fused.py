"""The fused-kernel integrator (ops/fused.py + trace_rays_fused) must equal
the reference jnp integrator in radiance AND gradients — interpret mode on
CPU; bench.py gates prim-id parity on real TPU hardware each round."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sexy_raytracer_tpu.diff.params import extract_params, merge_params
from sexy_raytracer_tpu.models import SceneBuilder
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.render.integrator import (
    trace_rays_fused,
    trace_rays_jnp,
)
from sexy_raytracer_tpu.utils import rng as rnglib
from sexy_raytracer_tpu.utils.config import CameraConfig


@pytest.fixture(scope="module")
def wavefront():
    b = SceneBuilder()
    checker = b.add_checker_texture((0.2, 0.3, 0.1), (0.9, 0.9, 0.9))
    b.add_sphere((0, -1000, 0), 1000.0, b.add_pbr_material(albedo_tex=checker))
    b.add_sphere((-2, 1, 0), 1.0, b.add_light_material(color=(10, 9, 7)))
    b.add_sphere((2, 1, 0), 1.0, b.add_metal_material((0.7, 0.6, 0.5), 0.0))
    b.add_sphere((0, 1, 2), 1.0, b.add_dielectric_material(1.5))
    tex = b.add_image_texture(
        (np.arange(16 * 16 * 3).reshape(16, 16, 3) * 7 % 256).astype(np.uint8)
    )
    mat = b.add_pbr_material(albedo_tex=tex)
    b.add_mesh([[-1, 0, -2], [1, 0, -2], [0, 2, -2]],
               [[0, 0], [1, 0], [0.5, 1]], [[0, 1, 2]], mat)
    scene = b.build(build_bvh=False)

    cam = Camera.from_config(
        CameraConfig(eye=(0, 2, 6), look_at=(0, 1, 0), vfov_degrees=45.0,
                     aperture=0.1, focus_dist=6.0),
        32 / 24,
    )
    R = 2048
    pid = jnp.arange(R, dtype=jnp.int32) % (32 * 24)
    keys = rnglib.ray_keys_2d(jax.random.key(1), pid,
                              jnp.zeros((R,), jnp.int32))
    ucam = rnglib.per_ray_uniform_block(keys, 5)
    u = ((pid % 32).astype(jnp.float32) + ucam[..., 0]) / 31
    v = ((24 - pid // 32).astype(jnp.float32) + ucam[..., 1]) / 23
    org, dirs, times = cam.get_rays(u, v, ucam[..., 2:5])
    bg = jnp.asarray((0.5, 0.7, 0.9), jnp.float32)
    return scene, org, dirs, times, keys, bg


def test_fused_radiance_matches_jnp(wavefront):
    scene, org, dirs, times, keys, bg = wavefront
    r1 = trace_rays_jnp(scene, org, dirs, times, keys, bg, 3,
                        method="bruteforce")
    r2 = trace_rays_fused(scene, org, dirs, times, keys, bg, 3,
                          method="bruteforce")
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               atol=2e-5, rtol=1e-5)


def test_last_bounce_vis_radiance_matches_jnp(wavefront):
    """The last-bounce emissive-visibility shortcut (closest emissive
    sphere + any-hit occlusion, ops/pallas_find.find_occluded) must equal
    the full closest-hit integrator — it replaces the final find_hit on
    the production TPU path."""
    scene, org, dirs, times, keys, bg = wavefront
    from sexy_raytracer_tpu.render.integrator import scene_no_emissive_tris

    assert scene_no_emissive_tris(scene)
    for bounces in (1, 3):
        r1 = trace_rays_jnp(scene, org, dirs, times, keys, bg, bounces,
                            method="bruteforce")
        r2 = trace_rays_fused(scene, org, dirs, times, keys, bg, bounces,
                              method="bruteforce", last_bounce_vis=True)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                                   atol=2e-5, rtol=1e-5)


def test_last_bounce_vis_gradients_match_jnp(wavefront):
    scene, org, dirs, times, keys, bg = wavefront
    params = extract_params(scene)
    tgt = jnp.full((org.shape[0], 3), 0.3)

    def loss(p, tracer, **kw):
        s = merge_params(scene, p)
        rad = tracer(s, org, dirs, times, keys, bg, 3,
                     method="bruteforce", **kw)
        res = jnp.clip(jnp.sqrt(jnp.clip(rad, 1e-8, None)), 0.0, 0.999)
        return jnp.mean((res - tgt) ** 2)

    g1 = jax.grad(lambda p: loss(p, trace_rays_jnp))(params)
    g2 = jax.grad(
        lambda p: loss(p, trace_rays_fused, last_bounce_vis=True)
    )(params)
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        assert np.isfinite(b).all(), k
        scale = max(np.abs(a).max(), 1e-10)
        assert np.abs(a - b).max() / scale < 5e-4, (
            f"{k}: rel diff {np.abs(a - b).max() / scale}"
        )


def test_scene_no_emissive_tris_gate():
    """An emissive TRIANGLE must disable the visibility shortcut."""
    from sexy_raytracer_tpu.render.integrator import scene_no_emissive_tris

    b = SceneBuilder()
    lm = b.add_light_material(color=(5, 5, 5))
    b.add_mesh([[-1, 0, -2], [1, 0, -2], [0, 2, -2]],
               [[0, 0], [1, 0], [0.5, 1]], [[0, 1, 2]], lm)
    scene = b.build(build_bvh=False)
    assert not scene_no_emissive_tris(scene)


def test_fused_gradients_match_jnp(wavefront):
    scene, org, dirs, times, keys, bg = wavefront
    params = extract_params(scene)
    tgt = jnp.full((org.shape[0], 3), 0.3)

    def loss(p, tracer):
        s = merge_params(scene, p)
        rad = tracer(s, org, dirs, times, keys, bg, 3, method="bruteforce")
        res = jnp.clip(jnp.sqrt(jnp.clip(rad, 1e-8, None)), 0.0, 0.999)
        return jnp.mean((res - tgt) ** 2)

    g1 = jax.grad(lambda p: loss(p, trace_rays_jnp))(params)
    g2 = jax.grad(lambda p: loss(p, trace_rays_fused))(params)
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        assert np.isfinite(b).all(), k
        scale = max(np.abs(a).max(), 1e-10)
        assert np.abs(a - b).max() / scale < 5e-4, (
            f"{k}: rel diff {np.abs(a - b).max() / scale}"
        )
