"""Wavefront path-tracing integrator.

The reference's depth-4 recursion (reference main.cpp:33-52) rewritten as a
fixed-depth ``lax.scan`` over bounce steps — exactly equivalent because
depth-out returns black (main.cpp:36-37), so a fixed-length loop with an
``alive`` mask computes the same sum:

    radiance = sum_k emitted_k * prod_{j<k} att_j   (+ background on miss)

SoA carry: (origin, dir, throughput, radiance, alive). Ray ``time`` is fixed
along a path (every scatter constructs the next ray with ``rIn.time``,
material.h:93,124,209).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from sexy_raytracer_tpu.ops.intersect import T_MIN_DEFAULT, find_hit, hit_data
from sexy_raytracer_tpu.ops.shade import shade
from sexy_raytracer_tpu.utils import rng

_BIG = 3.0e38


def trace_rays(
    scene,
    org,
    dir,
    time,
    keys,
    background,
    max_bounce: int,
    method: str = "auto",
    fused=None,
    last_bounce_vis: bool = False,
):
    """Dispatch: the fused-kernel integrator on TPU (or when ``fused=True``),
    the reference jnp integrator otherwise (``fused=False`` forces it).

    ``last_bounce_vis``: enable the last-bounce emissive-visibility
    shortcut in the fused integrator (see trace_rays_fused). Only valid
    when no triangle is emissive — callers derive it from
    :func:`scene_no_emissive_tris` on a CONCRETE scene.
    """
    if fused is None:
        fused = jax.default_backend() in ("tpu", "axon")
    if fused:
        return trace_rays_fused(
            scene, org, dir, time, keys, background, max_bounce, method,
            last_bounce_vis=last_bounce_vis,
        )
    return trace_rays_jnp(
        scene, org, dir, time, keys, background, max_bounce, method
    )


def scene_no_emissive_tris(scene) -> bool:
    """True iff no triangle's material is emissive, checked CONCRETELY.

    Returns False for traced scenes (inside jit), so jit-built call sites
    must compute this OUTSIDE the traced region and thread it through as
    a static argument. Gates the last-bounce visibility shortcut: an
    emissive triangle would be misclassified as an occluder there.
    """
    import numpy as np

    from sexy_raytracer_tpu.models.scene import MAT_LIGHT

    try:
        mt = np.asarray(scene.mat_type)
        tm = np.asarray(scene.tri_mat)
    except Exception:
        return False
    if tm.size == 0:
        return True
    return not bool(np.any(mt[tm] == MAT_LIGHT))


def trace_rays_jnp(
    scene,
    org,
    dir,
    time,
    keys,
    background,
    max_bounce: int,
    method: str = "auto",
):
    """Path-trace a wavefront of rays; returns radiance ``[R,3]``.

    ``keys``: [R] per-ray PRNG keys; per-bounce randomness is derived by
    folding in the bounce index, keeping every sample counter-based.

    The bounce body is rematerialized for the backward pass: saving every
    shading intermediate made the AD-forward scan 4x slower than the pure
    forward (measured 133 ms vs 31 ms per 131k-path wavefront). Only the
    winning primitive ids are checkpointed — they are tiny AND keeping
    them means the backward recompute skips the Pallas hit-search kernel
    entirely (hit_data recomputes the differentiable record from ids,
    ops/intersect.py).
    """
    R = org.shape[0]
    background = jnp.asarray(background, jnp.float32)

    @functools.partial(
        jax.checkpoint,
        policy=jax.checkpoint_policies.save_only_these_names("prim_ids"),
    )
    def bounce(carry, bounce_idx):
        org, dir, thr, rad, alive = carry

        # dead lanes get t_min = +huge: they miss everything and the
        # clustered kernel excludes them from its block cull lists, so
        # fully-dead ray blocks skip all triangle work (ops/pallas_find.py)
        t_min = jnp.where(alive, T_MIN_DEFAULT, 3.0e38)
        with jax.named_scope("find_hit"):
            prim, _t = find_hit(
                scene, org, dir, time, t_min=t_min, method=method
            )
            prim = checkpoint_name(prim, "prim_ids")
        with jax.named_scope("hit_data"):
            rec = hit_data(scene, org, dir, time, prim)

        with jax.named_scope("bounce_rng"):
            bkeys = jax.vmap(
                lambda k: jax.random.fold_in(k, 100 + bounce_idx)
            )(keys)
            u = rng.per_ray_uniform_block(bkeys, 6)
        rand = {
            "unit_vector": rng.unit_vector_from_uniforms(u[..., 0], u[..., 1]),
            "unit_ball": rng.in_unit_sphere_from_uniforms(
                u[..., 2], u[..., 3], u[..., 4]
            ),
            "uniform": u[..., 5],
        }
        with jax.named_scope("shade"):
            samp = shade(scene, rec, dir, rand)

        miss = alive & ~rec.hit
        rad = rad + jnp.where(miss[..., None], thr * background, 0.0)
        rad = rad + jnp.where((alive & rec.hit)[..., None], thr * samp.emitted, 0.0)

        alive_next = alive & rec.hit & samp.scattered
        thr = jnp.where(alive_next[..., None], thr * samp.attenuation, thr)
        org = jnp.where(alive_next[..., None], rec.p, org)
        dir = jnp.where(alive_next[..., None], samp.direction, dir)
        return (org, dir, thr, rad, alive_next), None

    init = (
        org,
        dir,
        jnp.ones((R, 3), jnp.float32),
        jnp.zeros((R, 3), jnp.float32),
        jnp.ones((R,), bool),
    )
    # Fully unroll the (small, static) bounce loop: a rolled scan walls
    # off cross-bounce fusion and pays while-loop bookkeeping per step —
    # measured 2.2x slower fwd+bwd (159 ms -> 72 ms per 131k-path train
    # step on v5e just from unroll=True). The per-bounce jax.checkpoint
    # still bounds backward memory.
    (_, _, _, radiance, _), _ = jax.lax.scan(
        bounce, init, jnp.arange(max_bounce, dtype=jnp.int32), unroll=True
    )
    return radiance


def trace_rays_fused(
    scene,
    org,
    dir,
    time,
    keys,
    background,
    max_bounce: int,
    method: str = "auto",
    last_bounce_vis: bool = False,
):
    """Fused-kernel integrator: same math as :func:`trace_rays_jnp`, with
    the per-bounce hit-record and shade/carry elementwise chains collapsed
    into two Pallas kernels each (ops/fused.py) and per-bounce randomness
    precomputed outside the remat.

    Motivation: each dispatched XLA op costs ~4.3 us of non-overlappable
    streaming overhead on this backend; the jnp bounce was ~300 entry ops
    after AD+remat (ops/fused.py module docstring). Everything per-ray is
    carried as stacked ``[rows, RB, 128]`` planes — scalar [R] quantities
    reshape into planes for free; only gathered tables and the find-kernel
    interface need transposes.
    """
    from sexy_raytracer_tpu.ops.fused import (
        RCH,
        hitrec_fused,
        shade_carry_fused,
    )
    from sexy_raytracer_tpu.ops.lookup import atlas_lookup, table_lookup
    from sexy_raytracer_tpu.ops.shade import material_packs

    R0 = org.shape[0]
    unit = RCH * 128
    Rpad = -(-R0 // unit) * unit
    RB = Rpad // 128
    pad = Rpad - R0
    background = jnp.asarray(background, jnp.float32)

    def row(x, fill=0.0):
        """[R] -> [RB, 128] plane (free reshape; pads with ``fill``)."""
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,), fill, x.dtype)]
            )
        return x.reshape(RB, 128)

    def rows3(x, fill=0.0):
        """[R, 3] -> [3, RB, 128] planes (one transpose)."""
        if pad:
            x = jnp.concatenate([x, jnp.full((pad, 3), fill, x.dtype)])
        return x.T.reshape(3, RB, 128)

    def rowsK(x):
        """[Rpad, K] -> [K, RB, 128] planes (one transpose)."""
        return x.T.reshape(x.shape[1], RB, 128)

    def prow(x):
        """[Rpad] -> [RB, 128] plane (free reshape, already padded)."""
        return x.reshape(RB, 128)

    T = scene.tri_v0.shape[0]
    S = scene.sph_c0.shape[0]
    L, H, W, C = scene.shade_atlas.shape

    # -- scene-only packs: computed ONCE, saved residuals (never remat'd) --
    if T > 0:
        tri_pack = jnp.concatenate(
            [
                scene.tri_v0, scene.tri_v1, scene.tri_v2,
                scene.tri_uv0, scene.tri_uv1, scene.tri_uv2,
                jax.lax.bitcast_convert_type(scene.tri_mat, jnp.float32)[:, None],
            ],
            axis=1,
        )  # [T, 16] — ops/intersect._triangle_record's pack
    if S > 0:
        sph_pack = jnp.concatenate(
            [
                scene.sph_c0, scene.sph_c1,
                scene.sph_t0[:, None], scene.sph_t1[:, None],
                scene.sph_radius[:, None],
                jax.lax.bitcast_convert_type(scene.sph_mat, jnp.float32)[:, None],
            ],
            axis=1,
        )  # [S, 10]
    mat_f, mat_i = material_packs(scene)
    # ONE combined material-row gather per bounce: int rows ride the float
    # table as raw bits (same trick as the tri pack's mat column) — halves
    # the per-bounce gather count in forward AND backward recompute
    mat_all = jnp.concatenate(
        [mat_f, jax.lax.bitcast_convert_type(mat_i, jnp.float32)], axis=1
    )  # [M, 30 + 9]
    n_matf = mat_f.shape[1]
    atlas2d = scene.shade_atlas.reshape(L * H, W, C)

    # -- per-bounce randomness for ALL bounces, outside the remat --
    def draw(k):
        return jnp.stack([
            jax.random.bits(jax.random.fold_in(k, 100 + b), (6,))
            for b in range(max_bounce)
        ])

    bits = jax.vmap(draw)(keys)  # [R, B, 6] uint32
    u = (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))

    def rand_rows(b):
        # componentized rng.unit_vector/in_unit_sphere_from_uniforms —
        # scalar [R] math so every plane is a free reshape
        z = 1.0 - 2.0 * u[:, b, 0]
        r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        phi = (2.0 * 3.1415926535897932385) * u[:, b, 1]
        ruv = [row(r * jnp.cos(phi)), row(r * jnp.sin(phi)), row(z)]
        z2 = 1.0 - 2.0 * u[:, b, 2]
        r2 = jnp.sqrt(jnp.maximum(0.0, 1.0 - z2 * z2))
        phi2 = (2.0 * 3.1415926535897932385) * u[:, b, 3]
        s = u[:, b, 4] ** (1.0 / 3.0)
        rball = [
            row(s * r2 * jnp.cos(phi2)),
            row(s * r2 * jnp.sin(phi2)),
            row(s * z2),
        ]
        return jnp.stack(ruv + rball + [row(u[:, b, 5])])  # [7, RB, 128]

    rand_all = jnp.stack([rand_rows(b) for b in range(max_bounce)])

    time_row = row(time)
    bg_rows = jnp.broadcast_to(background[:, None, None], (3, RB, 128))

    # carry = the K2 output stack: org(3) dir(3) thr(3) rad(3) alive pad(3)
    ones = jnp.ones((RB, 128), jnp.float32)
    zeros = jnp.zeros((RB, 128), jnp.float32)
    alive0 = row(jnp.ones((R0,), jnp.float32), fill=0.0)
    carry0 = jnp.concatenate([
        rows3(org), rows3(dir),
        jnp.stack([ones, ones, ones, zeros, zeros, zeros, alive0]),
        jnp.stack([zeros, zeros, zeros]),
    ])  # [16, RB, 128]

    # Per-bounce remat is OFF by default for the fused path: the saved
    # residual stacks are ~80 MB/bounce at the 131k-path training batch
    # (trivial against HBM), and skipping the backward's forward
    # recompute is worth 2.9 ms/step device (24.8 -> 22.0, round-5
    # measurement). SRT_FUSED_REMAT=1 restores the prim-id-only
    # checkpoint policy for memory-constrained giant batches.
    _ckpt = (
        functools.partial(
            jax.checkpoint,
            policy=jax.checkpoint_policies.save_only_these_names("prim_ids"),
        )
        if os.environ.get("SRT_FUSED_REMAT", "0") == "1"
        else (lambda f: f)
    )

    def shade_from_prim(carry, rand, prim, bg_rows_b, tris_possible=True):
        """Everything after hit search: gathers + the two fused kernels.

        ``tris_possible=False`` (the visibility tail) statically skips the
        triangle-row gather — the tail's prim ids are sphere-only.
        ``bg_rows_b``: per-lane background (the tail zeroes occluded
        lanes' background to encode "hit a non-emissive occluder").
        """
        alive = carry[12].reshape(Rpad) > 0.5
        t_min = jnp.where(alive, T_MIN_DEFAULT, _BIG)
        hit = prim >= 0
        is_tri = hit & (prim < T)
        is_sph = hit & (prim >= T)
        if T > 0 and tris_possible:
            g = table_lookup(
                tri_pack, jnp.clip(jnp.where(is_tri, prim, 0), 0, T - 1)
            )
            tri_mat = jax.lax.bitcast_convert_type(
                jax.lax.stop_gradient(g[:, 15]), jnp.int32
            )
            gT = rowsK(g[:, :15])
        else:
            tri_mat = jnp.zeros((Rpad,), jnp.int32)
            gT = jnp.zeros((15, RB, 128), jnp.float32)
        if S > 0:
            s = table_lookup(
                sph_pack, jnp.clip(jnp.where(is_sph, prim - T, 0), 0, S - 1)
            )
            sph_mat = jax.lax.bitcast_convert_type(
                jax.lax.stop_gradient(s[:, 9]), jnp.int32
            )
            sT = rowsK(s[:, :9])
        else:
            sph_mat = jnp.zeros((Rpad,), jnp.int32)
            sT = jnp.zeros((9, RB, 128), jnp.float32)

        with jax.named_scope("hitrec_fused"):
            hf = jnp.concatenate([
                carry[0:6],
                time_row[None],
                gT, sT,
                prow(t_min)[None],
                prow(is_tri.astype(jnp.float32))[None],
                prow(is_sph.astype(jnp.float32))[None],
            ])
            ho = hitrec_fused(hf)

        mat_id = jnp.where(
            is_tri, tri_mat, jnp.where(is_sph, sph_mat, 0)
        )
        gall = table_lookup(mat_all, mat_id)
        gf = gall[:, :n_matf]
        gi = jax.lax.bitcast_convert_type(
            jax.lax.stop_gradient(gall[:, n_matf:]), jnp.int32
        )

        # atlas texel fetch at the hit uv (ops/shade._sample_pack). The
        # kernel emits the triangle uv; sphere lanes get the spherical uv
        # here (acos/atan2 have no Mosaic lowering; stop-grad like
        # ops/intersect._sphere_record)
        u_ = ho[12].reshape(Rpad)
        v_ = ho[13].reshape(Rpad)
        if S > 0:
            nrm_sg = jax.lax.stop_gradient(ho[3:6].reshape(3, Rpad))
            sign = jnp.where(ho[15].reshape(Rpad) > 0.5, 1.0, -1.0)
            ox, oy, oz = nrm_sg[0] * sign, nrm_sg[1] * sign, nrm_sg[2] * sign
            theta = jnp.arccos(jnp.clip(-oy, -1.0, 1.0))
            phi = jnp.arctan2(-oz, ox) + jnp.pi
            u_ = jnp.where(is_sph, phi / (2.0 * jnp.pi), u_)
            v_ = jnp.where(is_sph, theta / jnp.pi, v_)
        layer = jnp.maximum(gi[:, 5], 0)
        tw = gi[:, 6]
        th = gi[:, 7]
        uu = jnp.clip(u_, 0.0, 1.0)
        vv = 1.0 - jnp.clip(v_, 0.0, 1.0)
        xi = jnp.minimum((uu * tw).astype(jnp.int32), tw - 1)
        yj = jnp.minimum((vv * th).astype(jnp.int32), th - 1)
        flat = (layer * H + yj) * W + xi
        pack = atlas_lookup(atlas2d, flat)

        with jax.named_scope("shade_carry_fused"):
            sf = jnp.concatenate([
                carry[0:13],
                ho[0:12],
                ho[15][None],
                prow(hit.astype(jnp.float32))[None],
                rowsK(gf),
                rowsK(pack),
                rand,
                bg_rows_b,
            ])
            si = rowsK(gi[:, jnp.array([0, 1, 2, 3, 4, 8])]).astype(jnp.int32)
            new_carry = shade_carry_fused(sf, si)
        return new_carry

    @_ckpt
    def bounce(carry, rand):
        org_f = carry[0:3].reshape(3, Rpad).T
        dir_f = carry[3:6].reshape(3, Rpad).T
        alive = carry[12].reshape(Rpad) > 0.5
        t_min = jnp.where(alive, T_MIN_DEFAULT, _BIG)
        time_f = time_row.reshape(Rpad)
        with jax.named_scope("find_hit"):
            prim, _t = find_hit(
                scene, org_f, dir_f, time_f, t_min=t_min, method=method
            )
            prim = checkpoint_name(prim, "prim_ids")
        return shade_from_prim(carry, rand, prim, bg_rows), None

    @_ckpt
    def bounce_tail_vis(carry, rand, prim, bg_rows_b):
        return shade_from_prim(
            carry, rand, prim, bg_rows_b, tris_possible=False
        )

    # Last-bounce visibility shortcut (round-5 perf): the final bounce's
    # contribution is the closest hit's EMISSION only (the scattered ray
    # is never traced — depth-out returns black, reference main.cpp:36-37).
    # Closest-hit therefore factors into a tiny closest-EMISSIVE-sphere
    # solve plus an any-hit occlusion query, which early-outs on the first
    # occluder instead of searching for the nearest (~2.5x cheaper than
    # the full find on the flagship). Callers enable it only after a
    # concrete no-emissive-triangles check (scene_no_emissive_tris).
    n_scan = max_bounce - 1 if last_bounce_vis else max_bounce
    if n_scan > 0:
        final, _ = jax.lax.scan(
            bounce, carry0, rand_all[:n_scan], unroll=True
        )
    else:
        final = carry0
    if last_bounce_vis:
        from sexy_raytracer_tpu.models.scene import MAT_LIGHT
        from sexy_raytracer_tpu.ops.intersect import emissive_sphere_hit
        from sexy_raytracer_tpu.ops.pallas_find import find_occluded

        org_f = final[0:3].reshape(3, Rpad).T
        dir_f = final[3:6].reshape(3, Rpad).T
        alive = final[12].reshape(Rpad) > 0.5
        t_min = jnp.where(alive, T_MIN_DEFAULT, _BIG)
        time_f = time_row.reshape(Rpad)
        with jax.named_scope("emissive_vis"):
            t_em, em_prim = emissive_sphere_hit(
                scene, org_f, dir_f, time_f, t_min
            )
            emis = jax.lax.stop_gradient(
                scene.mat_type[scene.sph_mat] == MAT_LIGHT
            )
            bound = jnp.where(
                alive,
                jnp.where(jnp.isfinite(t_em), t_em, _BIG),
                -_BIG,
            )
            occ = find_occluded(
                scene, org_f, dir_f, time_f, bound, t_min=t_min,
                sphere_occluder=~emis,
            )
            prim = jnp.where((~occ) & jnp.isfinite(t_em), em_prim, -1)
            prim = checkpoint_name(prim, "prim_ids")
            # occluded lanes hit a non-emissive prim: no background, no
            # emission -> encode as miss-with-zero-background
            occ_row = prow(occ.astype(jnp.float32))
            bg_tail = jnp.where(occ_row[None] > 0.5, 0.0, bg_rows)
        final = bounce_tail_vis(final, rand_all[max_bounce - 1], prim,
                                bg_tail)
    return final[9:12].reshape(3, Rpad).T[:R0]
