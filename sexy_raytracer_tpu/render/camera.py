"""Thin-lens camera with shutter-time sampling.

Reference camera.h:10-50 re-designed as a JAX pytree: the derived basis
vectors are arrays and ``from_params`` computes them in pure jnp, so camera
parameters (eye, look_at, fov, aperture, focus distance) are genuinely
differentiable — gradient-checked in tests/test_grad.py — and the ray
generator vectorizes over whole pixel fronts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sexy_raytracer_tpu.utils import rng
from sexy_raytracer_tpu.utils.config import CameraConfig
from sexy_raytracer_tpu.utils.mathx import deg2rad, unit_vector


class Camera(NamedTuple):
    origin: jnp.ndarray       # [3]
    lower_left: jnp.ndarray   # [3]
    horizontal: jnp.ndarray   # [3]
    vertical: jnp.ndarray     # [3]
    u_axis: jnp.ndarray       # [3] lens-offset basis (camera.h:25 'hor')
    v_axis: jnp.ndarray       # [3] lens-offset basis (camera.h:26 'vert')
    lens_radius: jnp.ndarray  # scalar
    time0: jnp.ndarray        # scalar
    time1: jnp.ndarray        # scalar

    @staticmethod
    def from_params(
        eye,
        look_at,
        up,
        vfov_degrees,
        aspect,
        aperture,
        focus_dist,
        time0=0.0,
        time1=1.0,
    ) -> "Camera":
        """Differentiable camera derivation (reference camera.h:19-37).

        All inputs may be traced jnp values; the look-at basis, viewport
        extents, and lens radius are jnp expressions, so ``jax.grad`` flows
        through to eye/look_at/up/vfov/aperture/focus_dist.
        """
        eye = jnp.asarray(eye, jnp.float32)
        look_at = jnp.asarray(look_at, jnp.float32)
        up = jnp.asarray(up, jnp.float32)
        theta = deg2rad(jnp.asarray(vfov_degrees, jnp.float32))
        h = jnp.tan(theta / 2.0)
        vp_height = 2.0 * h
        vp_width = aspect * vp_height

        w = unit_vector(eye - look_at)
        u = unit_vector(jnp.cross(up, w))
        v = unit_vector(jnp.cross(w, u))

        focus_dist = jnp.asarray(focus_dist, jnp.float32)
        horizontal = focus_dist * vp_width * u
        vertical = focus_dist * vp_height * v
        lower_left = eye - horizontal / 2.0 - vertical / 2.0 - focus_dist * w
        return Camera(
            origin=eye,
            lower_left=lower_left,
            horizontal=horizontal,
            vertical=vertical,
            u_axis=u,
            v_axis=v,
            lens_radius=jnp.asarray(aperture, jnp.float32) / 2.0,
            time0=jnp.asarray(time0, jnp.float32),
            time1=jnp.asarray(time1, jnp.float32),
        )

    @staticmethod
    def create(
        eye,
        look_at,
        up,
        vfov_degrees,
        aspect,
        aperture,
        focus_dist,
        time0=0.0,
        time1=1.0,
    ) -> "Camera":
        """Host-side convenience over :meth:`from_params` (same math)."""
        return Camera.from_params(
            np.asarray(eye, np.float32),
            np.asarray(look_at, np.float32),
            np.asarray(up, np.float32),
            vfov_degrees,
            aspect,
            aperture,
            focus_dist,
            time0,
            time1,
        )

    @staticmethod
    def from_config(cfg: CameraConfig, aspect: float) -> "Camera":
        return Camera.create(
            cfg.eye,
            cfg.look_at,
            cfg.up,
            cfg.vfov_degrees,
            aspect,
            cfg.aperture,
            cfg.focus_dist,
            cfg.time0,
            cfg.time1,
        )

    def get_rays(self, s, t, uniforms):
        """Generate rays for viewport coords ``s``/``t`` [R] (camera.h:40-50).

        ``uniforms``: [R, 3] U[0,1) draws — (disk_u, disk_v, time). Directions
        are deliberately left unnormalized, like the reference.
        """
        rd = self.lens_radius * rng.in_unit_disk_from_uniforms(
            uniforms[..., 0], uniforms[..., 1]
        )
        offset = rd[..., 0:1] * self.u_axis + rd[..., 1:2] * self.v_axis
        org = jnp.broadcast_to(self.origin, offset.shape) + offset
        direction = (
            self.lower_left
            + s[..., None] * self.horizontal
            + t[..., None] * self.vertical
            - self.origin
            - offset
        )
        time = self.time0 + (self.time1 - self.time0) * uniforms[..., 2]
        return org, direction, time
