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

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from sexy_raytracer_tpu.ops.intersect import T_MIN_DEFAULT, find_hit, hit_data
from sexy_raytracer_tpu.ops.shade import shade
from sexy_raytracer_tpu.utils import rng


def trace_rays(
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
