"""Boundary-gradient validation (diff/silhouette.py, VERDICT r4 #7).

The estimator claims: grad of sphere_silhouette_loss w.r.t. a sphere's
center approximates the contour term of the full-image resolved MSE. For
a featureless solid sphere against the sky, the TRUE loss gradient is
almost entirely that contour term (interior shading is ~translation
invariant), so central finite differences of the actual rendered loss are
a direct referee — with common random numbers (same seed both sides) the
FD is deterministic and clean.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sexy_raytracer_tpu.diff.silhouette import sphere_silhouette_loss  # noqa: E402
from sexy_raytracer_tpu.models.scene import SceneBuilder  # noqa: E402
from sexy_raytracer_tpu.render.camera import Camera  # noqa: E402
from sexy_raytracer_tpu.render.renderer import render_accumulate  # noqa: E402
from sexy_raytracer_tpu.utils.config import CameraConfig, RenderConfig  # noqa: E402

W, H = 96, 54
SPP = 8


def build(center):
    b = SceneBuilder()
    b.add_sphere(
        tuple(center), 1.0,
        b.add_pbr_material(albedo_tex=b.add_solid_texture((0.9, 0.15, 0.1))),
    )
    scene = b.build()
    cfg = RenderConfig(
        width=W, height=H, samples_per_pixel=SPP, max_bounce=2,
        camera=CameraConfig(
            eye=(0.0, 0.0, 5.0), look_at=(0.0, 0.0, 0.0),
            vfov_degrees=40.0, aperture=0.0, focus_dist=5.0,
        ),
    )
    return scene, cfg


def resolved(scene, cfg):
    acc = np.asarray(render_accumulate(scene, cfg, method="bruteforce"))
    return np.clip(
        np.sqrt(np.clip(acc / cfg.samples_per_pixel, 1e-8, None)), 0, 0.999
    )


def loss_of(center, target, cfg):
    scene, _ = build(center)
    img = resolved(scene, cfg)
    return float(np.mean((img - target) ** 2))


def test_silhouette_gradient_matches_fd():
    c_true = np.array([0.0, 0.0, 0.0])
    scene_t, cfg = build(c_true)
    target = resolved(scene_t, cfg)

    c0 = np.array([0.35, -0.25, 0.0])
    scene, _ = build(c0)
    camera = Camera.from_config(cfg.camera, cfg.aspect)

    def sil(c):
        sc = scene._replace(
            sph_c0=scene.sph_c0.at[0].set(c),
            sph_c1=scene.sph_c1.at[0].set(c),
        )
        return sphere_silhouette_loss(
            sc, camera, target, [0], jax.random.key(3),
            width=W, height=H, max_bounce=cfg.max_bounce,
            background=cfg.background, n_edge=256, method="bruteforce",
            fused=False,
        )

    g_sil = np.asarray(jax.grad(sil)(jnp.asarray(c0, jnp.float32)))

    # central finite differences of the REAL rendered loss (CRN: the
    # deterministic seed makes both sides share samples exactly)
    h = 0.05
    g_fd = np.zeros(3)
    for a in range(2):  # x and y; z edge signal is weaker, skip in FD
        e = np.zeros(3)
        e[a] = h
        g_fd[a] = (
            loss_of(c0 + e, target, cfg) - loss_of(c0 - e, target, cfg)
        ) / (2 * h)

    # direction agreement in the image plane (x, y)
    fd2 = g_fd[:2]
    sg2 = g_sil[:2]
    assert np.linalg.norm(fd2) > 1e-6, "FD gradient degenerate"
    cos = float(np.dot(fd2, sg2)
                / (np.linalg.norm(fd2) * np.linalg.norm(sg2) + 1e-12))
    assert cos > 0.7, f"cosine(FD, silhouette) = {cos}: {fd2} vs {sg2}"
    ratio = float(np.linalg.norm(sg2) / np.linalg.norm(fd2))
    assert 0.3 < ratio < 3.0, f"magnitude ratio {ratio}: {fd2} vs {sg2}"


def test_silhouette_recovers_position():
    """Gradient descent on the silhouette term alone pulls a displaced
    featureless sphere back to the target position — the capability the
    interior-only gradients measurably lack (r3 scope note)."""
    import optax

    c_true = np.array([0.0, 0.0, 0.0])
    scene_t, cfg = build(c_true)
    target = resolved(scene_t, cfg)

    c0 = jnp.asarray([0.4, -0.3, 0.0], jnp.float32)
    scene, _ = build(np.asarray(c0))
    camera = Camera.from_config(cfg.camera, cfg.aspect)

    def sil_loss(c, key):
        sc = scene._replace(
            sph_c0=scene.sph_c0.at[0].set(c),
            sph_c1=scene.sph_c1.at[0].set(c),
        )
        return sphere_silhouette_loss(
            sc, camera, target, [0], key,
            width=W, height=H, max_bounce=cfg.max_bounce,
            background=cfg.background, n_edge=128, method="bruteforce",
            fused=False,
        )

    opt = optax.adam(3e-2)
    c = c0
    st = opt.init(c)
    step = jax.jit(
        lambda c, st, key: _step(c, st, key)
    )

    def _step(c, st, key):
        g = jax.grad(sil_loss)(c, key)
        up, st2 = opt.update(g, st, c)
        return optax.apply_updates(c, up), st2

    for i in range(50):
        c, st = step(c, st, jax.random.key(i))
    err = float(jnp.linalg.norm(c - jnp.asarray(c_true, jnp.float32)))
    assert err < 0.12, f"center error after recovery: {err} (start 0.5)"
