"""Fused per-bounce Pallas kernels: hit record + shade + carry update.

WHY. On this backend every dispatched XLA op costs ~4.3 us of
non-overlappable streaming overhead (measured: a 1500-reduce program runs
13 ms wall with ~zero device work; the r3 train step had 4,956 entry ops
-> 22 ms of pure dispatch on top of 32 ms device time). The per-bounce
elementwise math (reference material.h:156-245, model.h:104-283,
sphere.h:54-106) was ~300 XLA ops per bounce after AD and remat. These
kernels collapse it to TWO pallas_calls per bounce forward and two more
for the backward:

  * ``hitrec_fused``   — the differentiable hit record from winning
    primitive rows (the jnp logic of ops/intersect.hit_data, componentized);
  * ``shade_carry_fused`` — all four materials + emitted + the integrator
    carry update (ops/shade.shade + render/integrator bounce tail).

LAYOUT. Every per-ray scalar is a ``[RB, 128]`` plane (R rays viewed as
RB x 128); logical inputs are stacked on a leading axis into ONE
``[K, RB, 128]`` array per kernel, so XLA-side preparation is one
concatenate instead of K ops, and every VPU op inside the kernel runs on
full (8, 128) tiles — no lane-sliced [R, K] layouts (a [512, 1] column op
uses 1/128 lanes).

BACKWARD. The backward kernels call ``jax.vjp`` over the same math *inside*
the kernel body — the whole linearization and transpose lowers into one
Mosaic program, exact to f32, with zero hand-derived derivative code to
drift out of sync.

Row index maps are defined by the ``HF_*`` / ``SF_*`` constants below; the
stacks are built by render/integrator.trace_rays_fused.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sexy_raytracer_tpu.models.scene import (
    MAT_DIELECTRIC,
    MAT_LIGHT,
    MAT_METAL,
    MAT_PBR,
)
from sexy_raytracer_tpu.utils.mathx import EPSILON, PI

RCH = 32            # [RB, 128] rows per kernel block (4096 rays)
_SG = jax.lax.stop_gradient


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# vector helpers on component triples of [RB, 128] planes
# ---------------------------------------------------------------------------

def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _vscale(s, v):
    return (s * v[0], s * v[1], s * v[2])


def _vmul(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def _vneg(v):
    return (-v[0], -v[1], -v[2])


def _vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _vwhere(m, a, b):
    return (
        jnp.where(m, a[0], b[0]),
        jnp.where(m, a[1], b[1]),
        jnp.where(m, a[2], b[2]),
    )


def _safe_sqrt(x, eps=1e-24):
    # mathx.safe_sqrt: finite gradient everywhere
    return jnp.sqrt(jnp.maximum(x, eps))


def _vunit(v):
    # mathx.unit_vector semantics: zero-length passes through unchanged
    len2 = _vdot(v, v)
    inv = 1.0 / _safe_sqrt(len2)
    return _vwhere(len2 == 0.0, v, _vscale(inv, v))


def _vreflect(v, n):
    return _vsub(v, _vscale(2.0 * _vdot(v, n), n))


def _vrefract(uv, n, ratio):
    # mathx.refract
    cos_theta = jnp.minimum(_vdot(n, _vneg(uv)), 1.0)
    perp = _vscale(ratio, _vadd(uv, _vscale(cos_theta, n)))
    par = _vscale(-_safe_sqrt(jnp.abs(1.0 - _vdot(perp, perp))), n)
    return _vadd(perp, par)


# ---------------------------------------------------------------------------
# K1: hit record math (ops/intersect._triangle_record/_sphere_record)
# ---------------------------------------------------------------------------
# HF rows (f32 input stack, NHF total):
#   0-2 org | 3-5 dir | 6 time | 7-21 tri row g[0:15]
#   (v0 v1 v2 uv0 uv1 uv2) | 22-30 sph row s[0:9] (c0 c1 t0 t1 radius)
#   | 31 t_min | 32 is_tri (0/1) | 33 is_sph (0/1)
NHF = 34
# HO rows (f32 output stack):
#   0-2 p | 3-5 normal | 6-8 tangent | 9-11 bitangent | 12-13 TRIANGLE uv
#   (sphere-lane uv is overridden by the integrator — acos/atan2 have no
#   Mosaic lowering and the uv is stop-grad anyway) | 14 t | 15 front (0/1)
NHO = 16


def hitrec_math(F):
    """[NHF, *B] f32 -> [NHO, *B] f32. Shape-polymorphic over the block."""
    org = (F[0], F[1], F[2])
    dr = (F[3], F[4], F[5])
    time = F[6]
    v0 = (F[7], F[8], F[9])
    v1 = (F[10], F[11], F[12])
    v2 = (F[13], F[14], F[15])
    uv0 = (F[16], F[17])
    uv1 = (F[18], F[19])
    uv2 = (F[20], F[21])
    c0 = (F[22], F[23], F[24])
    c1 = (F[25], F[26], F[27])
    st0, st1, srad = F[28], F[29], F[30]
    t_min = F[31]
    is_tri = _SG(F[32]) > 0.5

    # --- triangle (model.h:104-283 semantics via intersect.py) ---
    n = _vcross(_vsub(v1, v0), _vsub(v2, v0))
    ndir = _vdot(n, dr)
    d = -_vdot(n, v0)
    safe = jnp.where(ndir == 0.0, -1.0, ndir)
    t_t = -(_vdot(n, org) + d) / safe
    p_t = _vadd(org, _vscale(t_t, dr))

    def invdist(v):
        dist = _safe_sqrt(_vdot(_vsub(p_t, v), _vsub(p_t, v)))
        return 1.0 / jnp.maximum(dist, 1e-20)

    r0, r1, r2 = invdist(v0), invdist(v1), invdist(v2)
    denom = r0 + r1 + r2
    r0, r1, r2 = r0 / denom, r1 / denom, r2 / denom
    u_t = _SG(r0 * uv0[0] + r1 * uv1[0] + r2 * uv2[0])
    v_t = _SG(1.0 - (r0 * uv0[1] + r1 * uv1[1] + r2 * uv2[1]))

    outward_t = _vunit(n)
    front_t = _vdot(dr, outward_t) < 0.0
    normal_t = _vwhere(front_t, outward_t, _vneg(outward_t))

    e0 = _vsub(v1, v0)
    e1 = _vsub(v2, v0)
    duv0 = (uv1[0] - uv0[0], uv1[1] - uv0[1])
    duv1 = (uv2[0] - uv0[0], uv2[1] - uv0[1])
    f = duv0[0] * duv1[1] - duv1[0] * duv0[1]
    inv_f = 1.0 / jnp.where(f == 0.0, EPSILON, f)
    tangent_t = _vunit(
        _vscale(inv_f, _vsub(_vscale(duv1[1], e0), _vscale(duv0[1], e1)))
    )
    bitangent_t = _vunit(
        _vscale(inv_f, _vadd(_vscale(-duv1[0], e0), _vscale(duv0[0], e1)))
    )

    # --- sphere (sphere.h:54-106 semantics via intersect.py) ---
    moving = (c0[0] != c1[0]) | (c0[1] != c1[1]) | (c0[2] != c1[2])
    sdenom = jnp.where(st1 == st0, 1.0, st1 - st0)
    frac = (time - st0) / sdenom
    center = _vwhere(moving, _vadd(c0, _vscale(frac, _vsub(c1, c0))), c0)
    oc = _vsub(org, center)
    a = _vdot(dr, dr)
    half_b = _vdot(oc, dr)
    cterm = _vdot(oc, oc) - srad * srad
    disc = half_b * half_b - a * cterm
    sqrtd = _safe_sqrt(disc)
    safe_a = jnp.where(a == 0.0, 1.0, a)
    root0 = (-half_b - sqrtd) / safe_a
    root1 = (-half_b + sqrtd) / safe_a
    t_s = jnp.where(root0 >= t_min, root0, root1)
    p_s = _vadd(org, _vscale(t_s, dr))
    outward_s = _vunit(_vsub(p_s, center))  # no /radius (sphere.h:76)
    front_s = _vdot(dr, outward_s) < 0.0
    normal_s = _vwhere(front_s, outward_s, _vneg(outward_s))

    # sphere uv (acos/atan2 of the stop-grad outward) is computed OUTSIDE
    # the kernel by the integrator — Mosaic has no acos lowering; the uv
    # rows below carry the triangle uv, overridden on sphere lanes there.

    near_pole = (1.0 - jnp.abs(outward_s[1])) < EPSILON
    zero = jnp.zeros_like(outward_s[0])
    one = jnp.ones_like(outward_s[0])
    b = _vwhere(near_pole, (zero, zero, -one), (zero, one, zero))
    tangent_s = _vunit(_vcross(b, outward_s))
    bitangent_s = _vunit(_vcross(outward_s, tangent_s))

    # --- select (intersect.hit_data pick) ---
    p = _vwhere(is_tri, p_t, p_s)
    normal = _vwhere(is_tri, normal_t, normal_s)
    tangent = _vwhere(is_tri, tangent_t, tangent_s)
    bitangent = _vwhere(is_tri, bitangent_t, bitangent_s)
    u = u_t
    v = v_t
    t = jnp.where(is_tri, t_t, t_s)
    # mask logic, not where-of-bools: a bool-valued select materializes an
    # i8 vector Mosaic cannot truncate back to an i1 mask
    front = (is_tri & front_t) | (~is_tri & front_s)

    one = jnp.ones_like(p[0])
    nil = jnp.zeros_like(p[0])
    return jnp.stack([
        p[0], p[1], p[2],
        normal[0], normal[1], normal[2],
        tangent[0], tangent[1], tangent[2],
        bitangent[0], bitangent[1], bitangent[2],
        # bool -> f32 via select: a direct i1->f32 convert hits Mosaic's
        # "unsupported target bitwidth for truncation"
        u, v, t, jnp.where(front, one, nil),
    ])


# ---------------------------------------------------------------------------
# K2: shade + carry update (ops/shade.shade + integrator bounce tail)
# ---------------------------------------------------------------------------
# SF rows (f32 input stack):
#   0-2 org | 3-5 dir | 6-8 thr | 9-11 rad | 12 alive | 13-15 p
#   | 16-18 normal | 19-21 tangent | 22-24 bitangent | 25 front | 26 hit
#   | 27-56 gf[0:30] | 57-64 pack[0:8] | 65-67 rand unit_vector
#   | 68-70 rand unit_ball | 71 rand uniform | 72-74 background
NSF = 75
SF_GF = 27
SF_PACK = 57
SF_IOR = SF_GF + 7  # gf[7] = ior. Invariant: miss/pad lanes gather material
#   row 0, whose ior is 1.0 because every non-dielectric constructor in
#   models/scene.py stores ior=1.0 — keep that builder default or dielectric
#   refraction ratios on dead lanes go 0/NaN (ADVICE r4).
# SI rows (i32 input stack): mtype, albedo_kind, normal_kind, metal_kind,
#   rough_kind, emit_kind
NSI = 6
# SO rows: 0-2 org' | 3-5 dir' | 6-8 thr' | 9-11 rad' | 12 alive' | 13-15 pad
NSO = 16


def shade_carry_math(F, I):
    """[NSF, *B] f32, [NSI, *B] i32 -> [NSO, *B] f32."""
    org = (F[0], F[1], F[2])
    dr = (F[3], F[4], F[5])
    thr = (F[6], F[7], F[8])
    rad = (F[9], F[10], F[11])
    alive = _SG(F[12]) > 0.5
    p = (F[13], F[14], F[15])
    nrm = (F[16], F[17], F[18])
    tan = (F[19], F[20], F[21])
    bit = (F[22], F[23], F[24])
    front = _SG(F[25]) > 0.5
    hit = _SG(F[26]) > 0.5
    g = lambda k: F[SF_GF + k]      # noqa: E731 — gf row accessor
    pk = lambda k: F[SF_PACK + k]   # noqa: E731 — pack row accessor
    ruv = _SG((F[65], F[66], F[67]))
    rball = _SG((F[68], F[69], F[70]))
    runi = _SG(F[71])
    bg = (F[72], F[73], F[74])
    mtype, ak, nk, mk, rk, ek = I[0], I[1], I[2], I[3], I[4], I[5]

    base_rgb = (g(0), g(1), g(2))
    albedo_c0 = (g(8), g(9), g(10))
    albedo_c1 = (g(11), g(12), g(13))
    emit_rgb = (g(14), g(15), g(16))
    emit_c1 = (g(17), g(18), g(19))
    normal_c0 = (g(24), g(25), g(26))
    normal_c1 = (g(27), g(28), g(29))

    # checker parity shared by every procedural slot (texture.h:42-48)
    odd = (
        jnp.sin(10.0 * p[0]) * jnp.sin(10.0 * p[1]) * jnp.sin(10.0 * p[2])
    ) < 0.0

    # ---- PBR (material.h:156-245 via ops/shade._shade_pbr) ----
    checker = _vscale(255.0, _vwhere(odd, albedo_c1, albedo_c0))
    map_val = _vwhere(ak == 1, albedo_c0, (pk(0), pk(1), pk(2)))
    map_val = _vwhere(ak == 2, checker, map_val)
    attenuation = _vwhere(ak == 0, base_rgb, _vscale(1.0 / 255.0, map_val))

    nm_val = _vwhere(
        nk == 2, _vwhere(odd, normal_c1, normal_c0), (pk(3), pk(4), pk(5))
    )
    nm = _vscale(1.0 / 128.0, _vsub(nm_val, (128.0, 128.0, 128.0)))
    world_nm = _vadd(
        _vadd(_vscale(nm[0], tan), _vscale(nm[1], bit)), _vscale(nm[2], nrm)
    )
    normal = _vwhere(nk != 0, _vunit(world_nm), nrm)

    metallic, roughness = g(4), g(5)
    m_ck = jnp.where(odd, g(21), g(20))
    m = jnp.where(mk == 3, pk(6) / 255.0, metallic)
    m = jnp.clip(jnp.where(mk == 2, m_ck, m), 0.0, 1.0)
    m = jnp.where(mk == 0, metallic, m)
    r_ck = jnp.where(odd, g(23), g(22))
    r = jnp.where(rk == 3, pk(7) / 255.0, roughness)
    r = jnp.clip(jnp.where(rk == 2, r_ck, r), 0.0, 1.0)
    r = jnp.where(rk == 0, roughness, r)

    scatter = _vadd(normal, ruv)
    degen = (
        (jnp.abs(scatter[0]) < 1e-8)
        & (jnp.abs(scatter[1]) < 1e-8)
        & (jnp.abs(scatter[2]) < 1e-8)
    )
    scatter = _vunit(_vwhere(degen, normal, scatter))

    view = _vneg(_vunit(dr))
    half = _vunit(_vadd(scatter, view))
    n_dot_l = jnp.maximum(_vdot(normal, scatter), 0.0)
    n_dot_h = jnp.maximum(_vdot(normal, half), 0.0)
    h_dot_v = jnp.maximum(_vdot(half, view), 0.0)
    n_dot_v = jnp.maximum(_vdot(normal, view), 0.0)

    f0 = _vadd(_vscale(1.0 - m, (0.4, 0.4, 0.4)), _vscale(m, base_rgb))
    # guard 1e-12, not 1e-20: the VJP divides by the guard squared and
    # 1e-40 underflows f32 to 0 -> 0/0 NaN (ops/shade.trowbridge_reitz_ndf)
    alpha2 = (r * r) * (r * r)
    dterm = alpha2 / jnp.maximum(
        PI * (n_dot_h * n_dot_h * (alpha2 - 1.0) + 1.0) ** 2, 1e-12
    )
    power = 2.0 ** ((-5.55473 * h_dot_v - 6.98316) * h_dot_v)
    fres = _vadd(f0, _vscale(power, _vsub((1.0, 1.0, 1.0), f0)))
    k = ((r + 1.0) ** 2) / 8.0
    gaf_l = n_dot_l / (n_dot_l * (1.0 - k) + k)
    gaf_v = n_dot_v / (n_dot_v * (1.0 - k) + k)
    gterm = gaf_l * gaf_v

    diffuse = _vmul(
        _vmul(_vscale(1.0 / PI, attenuation), _vsub((1.0, 1.0, 1.0), fres)),
        _vscale(1.0 - m, base_rgb),
    )
    spec = _vscale(dterm * gterm / (4.0 * n_dot_v * n_dot_l + EPSILON), fres)
    pbr_att = _vscale(n_dot_l, _vadd(diffuse, spec))
    pbr_dir = scatter

    # ---- metal (material.h:87-102) ----
    fuzz = g(6)
    reflected = _vreflect(_vunit(dr), nrm)
    met_dir = _vadd(reflected, _vscale(fuzz, rball))
    met_ok = _vdot(met_dir, nrm) > 0.0
    met_att = base_rgb

    # ---- dielectric (material.h:104-137) ----
    ior = g(7)
    ratio = jnp.where(front, 1.0 / ior, ior)
    ud = _vunit(dr)
    cos_t = jnp.minimum(_vdot(nrm, _vneg(ud)), 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    cannot = ratio * sin_t > 1.0
    r0c = ((1.0 - ratio) / (1.0 + ratio)) ** 2
    reflectance = r0c + (1.0 - r0c) * (1.0 - cos_t) ** 5
    do_reflect = cannot | (reflectance > runi)
    die_dir = _vwhere(
        do_reflect, _vreflect(ud, nrm), _vrefract(ud, nrm, ratio)
    )

    # ---- diffuseLight emitted (material.h:139-154) ----
    emit_val = _vwhere(
        ek == 2,
        _vwhere(odd, emit_c1, emit_rgb),
        _vwhere(ek == 3, (pk(0), pk(1), pk(2)), emit_rgb),
    )
    zero3 = (jnp.zeros_like(emit_val[0]),) * 3
    emitted = _vwhere(mtype == MAT_LIGHT, emit_val, zero3)

    # ---- select by material id (shade() tail) ----
    att = _vwhere(mtype == MAT_PBR, pbr_att, zero3)
    att = _vwhere(mtype == MAT_METAL, met_att, att)
    att = _vwhere(mtype == MAT_DIELECTRIC, (1.0, 1.0, 1.0), att)
    sdir = _vwhere(mtype == MAT_PBR, pbr_dir, dr)
    sdir = _vwhere(mtype == MAT_METAL, met_dir, sdir)
    sdir = _vwhere(mtype == MAT_DIELECTRIC, die_dir, sdir)
    # mask logic, not where-of-bools (i8->i1 truncation unsupported)
    scattered = (
        (mtype == MAT_PBR)
        | ((mtype == MAT_METAL) & met_ok)
        | (mtype == MAT_DIELECTRIC)
    ) & hit

    # ---- carry update (integrator.bounce tail) ----
    miss = alive & ~hit
    takes = alive & hit
    rad = _vadd(rad, _vwhere(miss, _vmul(thr, bg), zero3))
    rad = _vadd(rad, _vwhere(takes, _vmul(thr, emitted), zero3))
    alive_next = alive & hit & scattered
    thr = _vwhere(alive_next, _vmul(thr, att), thr)
    org = _vwhere(alive_next, p, org)
    dr = _vwhere(alive_next, sdir, dr)

    z = jnp.zeros_like(F[0])
    return jnp.stack([
        org[0], org[1], org[2],
        dr[0], dr[1], dr[2],
        thr[0], thr[1], thr[2],
        rad[0], rad[1], rad[2],
        jnp.where(alive_next, jnp.ones_like(z), z),  # bool->f32 via select
        z, z, z,
    ])


# ---------------------------------------------------------------------------
# pallas wrappers with in-kernel VJP
# ---------------------------------------------------------------------------

def _blocks(rb):
    nb = -(-rb // RCH)
    assert nb * RCH == rb, (rb, RCH)
    return nb


def _hitrec_kernel(hf_ref, out_ref):
    out_ref[...] = hitrec_math(hf_ref[...])


def _hitrec_bwd_kernel(hf_ref, g_ref, dout_ref):
    F = hf_ref[...]
    _, vjp = jax.vjp(hitrec_math, F)
    (dF,) = vjp(g_ref[...])
    dout_ref[...] = dF


@jax.custom_vjp
def hitrec_fused(hf):
    """[NHF, RB, 128] f32 -> [NHO, RB, 128] f32 hit-record stack."""
    return _hitrec_call(hf)


def _hitrec_call(hf):
    rb = hf.shape[1]
    nb = _blocks(rb)
    return pl.pallas_call(
        _hitrec_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((NHF, RCH, 128), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NHO, RCH, 128), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NHO, rb, 128), jnp.float32),
        interpret=_interpret(),
    )(hf)


def _hitrec_fwd(hf):
    return _hitrec_call(hf), hf


def _hitrec_bwd(hf, gout):
    rb = hf.shape[1]
    nb = _blocks(rb)
    dhf = pl.pallas_call(
        _hitrec_bwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((NHF, RCH, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NHO, RCH, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NHF, RCH, 128), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NHF, rb, 128), jnp.float32),
        interpret=_interpret(),
    )(hf, gout)
    return (dhf,)


hitrec_fused.defvjp(_hitrec_fwd, _hitrec_bwd)


def _shade_kernel(sf_ref, si_ref, out_ref):
    out_ref[...] = shade_carry_math(sf_ref[...], si_ref[...])


def _shade_bwd_kernel(sf_ref, si_ref, g_ref, dout_ref):
    F = sf_ref[...]
    I = si_ref[...]
    _, vjp = jax.vjp(lambda f: shade_carry_math(f, I), F)
    (dF,) = vjp(g_ref[...])
    dout_ref[...] = dF


@jax.custom_vjp
def shade_carry_fused(sf, si):
    """([NSF, RB, 128] f32, [NSI, RB, 128] i32) -> [NSO, RB, 128] f32."""
    return _shade_call(sf, si)


def _shade_call(sf, si):
    rb = sf.shape[1]
    nb = _blocks(rb)
    return pl.pallas_call(
        _shade_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((NSF, RCH, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSI, RCH, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NSO, RCH, 128), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSO, rb, 128), jnp.float32),
        interpret=_interpret(),
    )(sf, si)


def _shade_fwd(sf, si):
    return _shade_call(sf, si), (sf, si)


def _shade_bwd(res, gout):
    sf, si = res
    rb = sf.shape[1]
    nb = _blocks(rb)
    dsf = pl.pallas_call(
        _shade_bwd_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((NSF, RCH, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSI, RCH, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NSO, RCH, 128), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NSF, RCH, 128), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSF, rb, 128), jnp.float32),
        interpret=_interpret(),
    )(sf, si, gout)
    return dsf, None


shade_carry_fused.defvjp(_shade_fwd, _shade_bwd)
