"""Texture evaluation on device.

Replaces the reference's virtual ``texture::value`` dispatch (reference
texture.h:13-16) with a branchless select over texture kinds on SoA data.

Scale convention (deliberately reference-faithful): ``value`` returns colors
at the *reference scale* of each texture type —

  * solid: the stored color as-is (texture.h:26-28),
  * checker: even/odd color ``* 255`` selected by the sign of
    ``sin(10x) sin(10y) sin(10z)`` (texture.h:42-48),
  * image: raw 0-255 texel values, nearest-neighbor, u clamped, v flipped
    (texture.h:129-147).

Consumers divide by 255 exactly where the reference does
(e.g. material.h:165-167), so all of the reference's scale quirks — including
the near-black solid-color PBR albedo (solid / 255) — are reproduced.
Missing image files are encoded by the scene builder as magenta solids
(texture.h:131).

Table lookups ride packed-row gathers (one float row + one int row per
evaluation) — TPU gathers have a high per-op fixed cost, so fewer/wider
gathers win. Packs are built from the primal scene arrays inside the trace
so atlas/color gradients flow for inverse rendering.
"""

from __future__ import annotations

import jax.numpy as jnp

from sexy_raytracer_tpu.models.scene import TEX_CHECKER, TEX_IMAGE
from sexy_raytracer_tpu.ops.lookup import atlas_lookup


def texture_packs(scene):
    """Packed texture tables: float rows [K,6], int rows [K,4]."""
    tex_f = jnp.concatenate([scene.tex_color0, scene.tex_color1], axis=1)
    tex_i = jnp.stack(
        [scene.tex_type, scene.tex_layer, scene.tex_w, scene.tex_h], axis=1
    )
    return tex_f, tex_i


def texture_value_packed(tex_f, tex_i, atlas, tex_id, u, v, p):
    """Evaluate textures for each ray given prebuilt packs.

    ``tex_id`` [R] int32 (entries may be -1: result is undefined there —
    callers mask), ``u``/``v`` [R], ``p`` [R,3]. Returns [R,3] float32.
    """
    i = jnp.clip(tex_id, 0, tex_f.shape[0] - 1)
    gf = tex_f[i]
    gi = tex_i[i]
    ttype = gi[:, 0]
    c0 = gf[:, 0:3]
    c1 = gf[:, 3:6]

    # checker (texture.h:42-48)
    sines = (
        jnp.sin(10.0 * p[..., 0])
        * jnp.sin(10.0 * p[..., 1])
        * jnp.sin(10.0 * p[..., 2])
    )
    checker = jnp.where((sines < 0.0)[..., None], c1, c0) * 255.0

    # image (texture.h:129-147): nearest neighbor, u clamped, v flipped
    layer = jnp.maximum(gi[:, 1], 0)
    w = gi[:, 2]
    h = gi[:, 3]
    uu = jnp.clip(u, 0.0, 1.0)
    vv = 1.0 - jnp.clip(v, 0.0, 1.0)
    xi = jnp.minimum((uu * w).astype(jnp.int32), w - 1)
    yj = jnp.minimum((vv * h).astype(jnp.int32), h - 1)
    L, H, W, _ = atlas.shape
    flat = (layer * H + yj) * W + xi
    image = atlas_lookup(atlas.reshape(L * H, W, 3), flat)

    out = jnp.where((ttype == TEX_CHECKER)[..., None], checker, c0)
    out = jnp.where((ttype == TEX_IMAGE)[..., None], image, out)
    return out


def texture_value(scene, tex_id, u, v, p):
    """Convenience wrapper building the packs in place."""
    tex_f, tex_i = texture_packs(scene)
    return texture_value_packed(tex_f, tex_i, scene.atlas, tex_id, u, v, p)
