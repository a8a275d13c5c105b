"""Material shading: BRDF evaluation + next-ray sampling.

Branchless wavefront replacement for the reference's virtual
``material::scatter`` dispatch (reference main.cpp:46): all four material
models are evaluated on the whole ray front (cheap elementwise math) and the
result is selected by material id. This is the differentiable core — texture
atlas texels, material factors, and geometry all receive gradients through
this module.

Reference semantics (quirks included, since they define the images):

  * pbrMetallicRoughness (material.h:156-245): albedo map sampled then /255;
    tangent-space normal map via TBN; metallic from the *red* channel /255,
    roughness from the *green* channel /255; cosine-ish scatter
    ``normal + randomUnitVector``; half-vector from scatter-as-light;
    ``F0 = lerp(0.4, albedoFactor, m)`` — the reference's 0.4, not the
    canonical 0.04 (material.h:228); Lambert diffuse times (1-F)(1-m) and
    the albedo *factor* applied a second time for textured materials
    (material.h:237); specular D*F*G / (4 NdotV NdotL + eps); everything
    multiplied by NdotL; always scatters.
  * metal (material.h:87-102): mirror reflect + fuzz * random-in-unit-ball;
    absorbed if the scattered ray leaves below the surface.
  * dielectric (material.h:104-137): Schlick-probability reflect/refract
    with total internal reflection.
  * diffuseLight (material.h:139-154): never scatters; emits its texture.

BRDF terms are from pbr.h:58-81 (GGX NDF with alpha=roughness^2, Schlick
GAF with k=(r+1)^2/8, UE4 spherical-gaussian Schlick Fresnel).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sexy_raytracer_tpu.models.scene import (
    MAT_DIELECTRIC,
    MAT_LIGHT,
    MAT_METAL,
    MAT_PBR,
)
from sexy_raytracer_tpu.ops.texture import texture_packs, texture_value_packed
from sexy_raytracer_tpu.utils.mathx import (
    EPSILON,
    PI,
    dot,
    near_zero,
    normal_int_to_float,
    reflect,
    refract,
    unit_vector,
)


class ScatterSample(NamedTuple):
    attenuation: jnp.ndarray  # [R,3] throughput multiplier
    emitted: jnp.ndarray      # [R,3] emitted radiance at the hit
    direction: jnp.ndarray    # [R,3] next ray direction
    scattered: jnp.ndarray    # [R] bool — False terminates the path


# -- BRDF terms (pbr.h:58-81) ----------------------------------------------

def trowbridge_reitz_ndf(n_dot_h, roughness):
    alpha = roughness * roughness
    alpha2 = alpha * alpha
    denom = PI * (n_dot_h * n_dot_h * (alpha2 - 1.0) + 1.0) ** 2
    # guard the r=0, NdotH=1 singular point (the reference computes 0/0
    # NaN there, pbr.h:62-64 — a measure-zero event we make finite)
    return alpha2 / jnp.maximum(denom, 1e-20)


def schlick_gaf(n_dot_v, roughness):
    k = ((roughness + 1.0) ** 2) / 8.0
    return n_dot_v / (n_dot_v * (1.0 - k) + k)


def fresnel_epic(f0, h_dot_v):
    power = 2.0 ** ((-5.55473 * h_dot_v - 6.98316) * h_dot_v)
    return f0 + (1.0 - f0) * power[..., None]


# -- material models --------------------------------------------------------
#
# All per-ray material parameters come from two packed-row gathers (floats
# [M,8], ints [M,6]) shared by every material model — see texture.py for the
# rationale. ``mat`` below is the dict built in shade().

def _shade_pbr(scene, mat, tex, rec, ray_dir, unit_sphere_dir):
    tex_f, tex_i = tex
    base_rgb = mat["base_color"][..., :3]

    albedo_tex = mat["albedo_tex"]
    has_albedo = albedo_tex >= 0
    tex_rgb = texture_value_packed(
        tex_f, tex_i, scene.atlas, albedo_tex, rec.uv[..., 0], rec.uv[..., 1], rec.p
    )
    # textured: sample / 255 (material.h:165-167); untextured: factor rgb
    attenuation = jnp.where(has_albedo[..., None], tex_rgb / 255.0, base_rgb)

    normal_tex = mat["normal_tex"]
    has_normal = normal_tex >= 0
    nm = texture_value_packed(
        tex_f, tex_i, scene.atlas, normal_tex, rec.uv[..., 0], rec.uv[..., 1], rec.p
    )
    nm = normal_int_to_float(nm)
    # TBN columns: tangent, bitangent, normal (material.h:179-185)
    world_nm = (
        rec.tangent * nm[..., 0:1]
        + rec.bitangent * nm[..., 1:2]
        + rec.normal * nm[..., 2:3]
    )
    normal = jnp.where(has_normal[..., None], unit_vector(world_nm), rec.normal)

    metallic_tex = mat["metallic_tex"]
    mtex = texture_value_packed(
        tex_f, tex_i, scene.atlas, metallic_tex, rec.uv[..., 0], rec.uv[..., 1], rec.p
    )
    m = jnp.where(
        metallic_tex >= 0,
        jnp.clip(mtex[..., 0] / 255.0, 0.0, 1.0),  # red channel, material.h:191
        mat["metallic"],
    )

    roughness_tex = mat["roughness_tex"]
    rtex = texture_value_packed(
        tex_f, tex_i, scene.atlas, roughness_tex, rec.uv[..., 0], rec.uv[..., 1], rec.p
    )
    r = jnp.where(
        roughness_tex >= 0,
        jnp.clip(rtex[..., 1] / 255.0, 0.0, 1.0),  # green channel, material.h:197
        mat["roughness"],
    )

    # scatter direction (material.h:203-208)
    scatter_dir = normal + unit_sphere_dir
    degenerate = near_zero(scatter_dir)
    scatter_dir = jnp.where(degenerate[..., None], normal, scatter_dir)
    scatter_dir = unit_vector(scatter_dir)

    view = -unit_vector(ray_dir)
    half = unit_vector(scatter_dir + view)

    n_dot_l = jnp.maximum(dot(normal, scatter_dir), 0.0)
    n_dot_h = jnp.maximum(dot(normal, half), 0.0)
    h_dot_v = jnp.maximum(dot(half, view), 0.0)
    n_dot_v = jnp.maximum(dot(normal, view), 0.0)

    f0 = (1.0 - m[..., None]) * 0.4 + m[..., None] * base_rgb  # material.h:228
    d = trowbridge_reitz_ndf(n_dot_h, r)
    f = fresnel_epic(f0, h_dot_v)
    g = schlick_gaf(n_dot_l, r) * schlick_gaf(n_dot_v, r)

    diffuse = (attenuation / PI) * (1.0 - f) * (1.0 - m[..., None]) * base_rgb
    specular = (d * g)[..., None] * f / (4.0 * n_dot_v * n_dot_l + EPSILON)[..., None]
    out_attenuation = (diffuse + specular) * n_dot_l[..., None]
    return out_attenuation, scatter_dir


def _shade_metal(mat, rec, ray_dir, ball_sample):
    albedo = mat["base_color"][..., :3]
    fuzz = mat["fuzz"]
    reflected = reflect(unit_vector(ray_dir), rec.normal)
    direction = reflected + fuzz[..., None] * ball_sample
    ok = dot(direction, rec.normal) > 0.0  # material.h:96
    return albedo, direction, ok


def _shade_dielectric(mat, rec, ray_dir, uniform_sample):
    ir = mat["ior"]
    ratio = jnp.where(rec.front_face, 1.0 / ir, ir)
    unit_dir = unit_vector(ray_dir)
    cos_theta = jnp.minimum(dot(rec.normal, -unit_dir), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    cannot_refract = ratio * sin_theta > 1.0
    r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
    do_reflect = cannot_refract | (reflectance > uniform_sample)
    direction = jnp.where(
        do_reflect[..., None],
        reflect(unit_dir, rec.normal),
        refract(unit_dir, rec.normal, ratio),
    )
    return jnp.ones_like(direction), direction


def _emitted(scene, mat, tex, rec):
    tex_f, tex_i = tex
    emit_tex = mat["emit_tex"]
    is_light = mat["type"] == MAT_LIGHT
    val = texture_value_packed(
        tex_f, tex_i, scene.atlas, emit_tex, rec.uv[..., 0], rec.uv[..., 1], rec.p
    )
    return jnp.where((is_light & (emit_tex >= 0))[..., None], val, 0.0)


def material_packs(scene):
    """Packed material tables: float rows [M,8], int rows [M,6]."""
    mat_f = jnp.concatenate(
        [
            scene.mat_base_color,
            scene.mat_metallic[:, None],
            scene.mat_roughness[:, None],
            scene.mat_fuzz[:, None],
            scene.mat_ior[:, None],
        ],
        axis=1,
    )
    mat_i = jnp.stack(
        [
            scene.mat_type,
            scene.mat_albedo_tex,
            scene.mat_normal_tex,
            scene.mat_metallic_tex,
            scene.mat_roughness_tex,
            scene.mat_emit_tex,
        ],
        axis=1,
    )
    return mat_f, mat_i


def shade(scene, rec, ray_dir, rand) -> ScatterSample:
    """Evaluate all materials and select by id.

    ``rand`` is a dict with pre-drawn per-ray randomness:
      ``unit_vector`` [R,3] (PBR scatter), ``unit_ball`` [R,3] (metal fuzz),
      ``uniform`` [R] (dielectric reflect/refract choice).
    """
    mat_f, mat_i = material_packs(scene)
    gf = mat_f[rec.mat_id]
    gi = mat_i[rec.mat_id]
    mat = {
        "base_color": gf[:, 0:4],
        "metallic": gf[:, 4],
        "roughness": gf[:, 5],
        "fuzz": gf[:, 6],
        "ior": gf[:, 7],
        "type": gi[:, 0],
        "albedo_tex": gi[:, 1],
        "normal_tex": gi[:, 2],
        "metallic_tex": gi[:, 3],
        "roughness_tex": gi[:, 4],
        "emit_tex": gi[:, 5],
    }
    tex = texture_packs(scene)
    mtype = mat["type"]

    pbr_att, pbr_dir = _shade_pbr(scene, mat, tex, rec, ray_dir, rand["unit_vector"])
    met_att, met_dir, met_ok = _shade_metal(mat, rec, ray_dir, rand["unit_ball"])
    die_att, die_dir = _shade_dielectric(mat, rec, ray_dir, rand["uniform"])
    emitted = _emitted(scene, mat, tex, rec)

    def sel(mask, a, b):
        return jnp.where(mask[..., None] if a.ndim > 1 else mask, a, b)

    att = sel(mtype == MAT_PBR, pbr_att, jnp.zeros_like(pbr_att))
    att = sel(mtype == MAT_METAL, met_att, att)
    att = sel(mtype == MAT_DIELECTRIC, die_att, att)

    direction = sel(mtype == MAT_PBR, pbr_dir, ray_dir)
    direction = sel(mtype == MAT_METAL, met_dir, direction)
    direction = sel(mtype == MAT_DIELECTRIC, die_dir, direction)

    scattered = jnp.where(mtype == MAT_PBR, True, False)
    scattered = jnp.where(mtype == MAT_METAL, met_ok, scattered)
    scattered = jnp.where(mtype == MAT_DIELECTRIC, True, scattered)
    # MAT_LIGHT: never scatters (material.h:144-146)

    return ScatterSample(
        attenuation=att,
        emitted=emitted,
        direction=direction,
        scattered=scattered & rec.hit,
    )
