"""Pallas TPU kernel: fused brute-force closest-triangle search.

The jnp fallback (ops/intersect.py) materializes [R, tile, 3] intermediates
in HBM; this kernel keeps the whole triangle pack and all per-tile
intermediates in VMEM, writing only (best_t [R], best_idx [R]). The
triangle test is phrased so the MXU does all the dot products:

    org4 = [ox, oy, oz, 1],  dir4 = [dx, dy, dz, 0]
    A = org4 @ W   -> per-triangle [org.n + d | org.q_i - c_i]   (i = 0..2)
    B = dir4 @ W   -> per-triangle [dir.n     | dir.q_i        ]
    t = -A_n / B_n
    edge_i = A_qi + t * B_qi            (>= 0 inside, model.h:136-154)
    valid  = (B_n <= -eps) & edges & (t >= t_min)

where ``W`` is the [4, 4T] stack of the precomputed plane/edge vectors
(models/scene.py prepare_triangles). Back-face culling and the parallel
reject collapse into ``B_n <= -eps`` exactly as the reference's pair of
tests (model.h:119-123).

Hit *finding* is non-differentiable by design (SURVEY §7): the caller
recomputes hit data for winners with ops/intersect.hit_data, which carries
all gradients. So this kernel needs no VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sexy_raytracer_tpu.utils.mathx import EPSILON

RAY_BLOCK = 256      # rays per program
TRI_TILE = 512       # triangles per inner-loop step

_BIG = 3.0e38  # plain float: jnp constants may not be captured by kernels


def pallas_supported() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _tri_kernel(t_min, n_tiles, org_ref, dir_ref, w_ref, out_t_ref, out_i_ref):
    """Grid: (R / RAY_BLOCK,). w_ref: [4, 4*Tpad] columns grouped per tile as
    [n | q0 | q1 | q2], each TRI_TILE wide."""
    org4 = org_ref[...]          # [BR, 4]
    dir4 = dir_ref[...]          # [BR, 4]
    BR = org4.shape[0]

    def body(k, carry):
        best_t, best_i = carry
        w = w_ref[:, pl.ds(k * (4 * TRI_TILE), 4 * TRI_TILE)]   # [4, 4*TT]
        a = jnp.dot(org4, w, preferred_element_type=jnp.float32)  # [BR, 4*TT]
        b = jnp.dot(dir4, w, preferred_element_type=jnp.float32)
        a_n = a[:, 0:TRI_TILE]
        b_n = b[:, 0:TRI_TILE]
        plane_ok = b_n <= -EPSILON
        t = -a_n / jnp.where(plane_ok, b_n, 1.0)
        e0 = a[:, TRI_TILE : 2 * TRI_TILE] + t * b[:, TRI_TILE : 2 * TRI_TILE]
        e1 = a[:, 2 * TRI_TILE : 3 * TRI_TILE] + t * b[:, 2 * TRI_TILE : 3 * TRI_TILE]
        e2 = a[:, 3 * TRI_TILE : 4 * TRI_TILE] + t * b[:, 3 * TRI_TILE : 4 * TRI_TILE]
        valid = (
            plane_ok
            & (e0 >= 0.0)
            & (e1 >= 0.0)
            & (e2 >= 0.0)
            & (t >= t_min)
        )
        t = jnp.where(valid, t, _BIG)
        tile_t = jnp.min(t, axis=1)                       # [BR]
        tile_arg = jnp.argmin(t, axis=1).astype(jnp.int32)
        tile_i = k * TRI_TILE + tile_arg
        better = tile_t < best_t
        return (
            jnp.where(better, tile_t, best_t),
            jnp.where(better, tile_i, best_i),
        )

    init = (
        jnp.full((BR,), _BIG, jnp.float32),
        jnp.full((BR,), -1, jnp.int32),
    )
    best_t, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
    out_t_ref[:, 0] = best_t
    out_i_ref[:, 0] = jnp.where(best_t < _BIG, best_i, -1)


def _build_weights(scene):
    """[4, 4*Tpad] weight stack, columns tile-grouped as [n|q0|q1|q2]."""
    n = scene.tri_n          # [T,3]
    d = scene.tri_d          # [T]
    q = scene.tri_q          # [T,3,3]
    c = scene.tri_c          # [T,3]
    T = n.shape[0]
    n_tiles = max(1, -(-T // TRI_TILE))
    Tpad = n_tiles * TRI_TILE
    pad = Tpad - T

    def pad_cols(x):  # [T, k] -> [Tpad, k]
        return jnp.pad(x, ((0, pad), (0, 0)))

    wn = jnp.concatenate([n, d[:, None]], axis=1)              # [T,4]
    wq = [
        jnp.concatenate([q[:, i, :], -c[:, i : i + 1]], axis=1)  # [T,4]
        for i in range(3)
    ]
    mats = [pad_cols(m).reshape(n_tiles, TRI_TILE, 4) for m in [wn] + wq]
    # per tile: [n | q0 | q1 | q2] -> [n_tiles, 4*TT, 4] -> [4, n_tiles*4*TT]
    stacked = jnp.concatenate(mats, axis=1)  # [n_tiles, 4*TT, 4]
    w = stacked.reshape(n_tiles * 4 * TRI_TILE, 4).T  # [4, 4*Tpad]
    return jax.lax.stop_gradient(w), n_tiles


@functools.partial(jax.jit, static_argnames=("t_min_static",))
def _tri_find_pallas(w, n_tiles_arr, org, dir, t_min_static):
    # n_tiles is static via w's shape
    n_tiles = w.shape[1] // (4 * TRI_TILE)
    R = org.shape[0]
    pad = (-R) % RAY_BLOCK
    Rpad = R + pad
    org4 = jnp.concatenate(
        [org, jnp.ones((R, 1), jnp.float32)], axis=1
    )
    dir4 = jnp.concatenate([dir, jnp.zeros((R, 1), jnp.float32)], axis=1)
    if pad:
        org4 = jnp.pad(org4, ((0, pad), (0, 0)))
        dir4 = jnp.pad(dir4, ((0, pad), (0, 0)))

    grid = (Rpad // RAY_BLOCK,)
    out_t, out_i = pl.pallas_call(
        functools.partial(_tri_kernel, t_min_static, n_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (4, w.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rpad, 1), jnp.float32),
            jax.ShapeDtypeStruct((Rpad, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(org4, dir4, w)
    return out_t.reshape(Rpad)[:R], out_i.reshape(Rpad)[:R]


def find_hit_pallas(scene, org, dir, time, t_min=None):
    """Drop-in replacement for find_hit_bruteforce on TPU."""
    from sexy_raytracer_tpu.ops.intersect import (
        T_MIN_DEFAULT,
        _sph_candidates,
    )

    R = org.shape[0]
    if t_min is None:
        t_min_scalar = T_MIN_DEFAULT
        t_min_vec = jnp.full((R,), T_MIN_DEFAULT)
    elif jnp.ndim(t_min) == 0:
        t_min_scalar = float(t_min)
        t_min_vec = jnp.full((R,), t_min_scalar)
    else:
        # per-ray t_min not supported by the kernel fast path
        from sexy_raytracer_tpu.ops.intersect import find_hit_bruteforce

        return find_hit_bruteforce(scene, org, dir, time, t_min)

    T = scene.tri_v0.shape[0]
    if T > 0:
        w, _ = _build_weights(scene)
        tri_t, tri_i = _tri_find_pallas(
            w, None, jax.lax.stop_gradient(org), jax.lax.stop_gradient(dir),
            t_min_scalar,
        )
        tri_t = jnp.where(tri_i >= 0, tri_t, jnp.inf)
    else:
        tri_t = jnp.full((R,), jnp.inf)
        tri_i = jnp.full((R,), -1, jnp.int32)

    sph_t, sph_i = _sph_candidates(scene, org, dir, time, t_min_vec)

    use_sph = sph_t < tri_t
    t = jnp.where(use_sph, sph_t, tri_t)
    prim = jnp.where(use_sph, T + sph_i, tri_i)
    prim = jnp.where(jnp.isfinite(t), prim, -1)
    return jax.lax.stop_gradient(prim), jax.lax.stop_gradient(t)
