"""Row gathers with TPU-friendly backward passes.

``jnp.take``'s VJP is a scatter-add, which TPUs execute row-serially
(~11 ms for 131k rows into a 786k-row table, measured device-side) and
degrades further when many rays land on the same row (real renders
concentrate texel hits).

* ``table_lookup`` — small tables (<= ONEHOT_MAX_ROWS): backward is a
  chunked one-hot matmul (dTable = sum_chunks onehot^T @ g). Used for
  material rows and other tiny packs. Larger tables route to the
  histogram below.
* ``atlas_lookup`` — large [rows, W, C] atlases (texture packs): backward
  is the sort-based scatter-free dense histogram of ops/histogram.py
  (sort + cumsum segment-sum + Pallas windowed one-hot placement), ~3 ms
  per 131k updates vs ~12 ms for the round-1 factorized one-hot matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# tables with at most this many rows get the one-hot matmul backward;
# larger ones use the sort-based dense histogram (ops/histogram.py)
ONEHOT_MAX_ROWS = 1024
# elements budget for one backward chunk's one-hot block ([chunk, rows]
# f32): chunking exists to bound that intermediate, but a sequential
# lax.scan of tiny dots is launch-bound, so the chunk adapts to the table
# — a 5-row material table does the whole 131k-ray front in ONE dot
ONEHOT_BLOCK_ELEMS = 1 << 24


# Tables at most this many rows skip the gather entirely in the FORWARD:
# out = select-sum over rows (idx == m picks row m). TPU row gathers are
# row-serial (the [R] index chain and the gather itself land in the
# scalar memory space, ~0.4-0.7 ms per 131k-ray material fetch, measured
# round-5); the select-sum is one fused vector pass and bit-exact
# (multiplies by 0/1 only). Out-of-range idx yields row 0 like the
# clamped gathers the callers build.
SELECT_FWD_MAX_ROWS = 16


def table_lookup(table, idx):
    """``table[idx]``: [N, K], [R] int32 -> [R, K]; idx must be in-range."""
    return _lookup(table.shape[0], table, idx)


def _select_sum(table, idx):
    out = jnp.broadcast_to(table[0], (idx.shape[0], table.shape[1]))
    sel = idx[:, None]
    for m in range(1, table.shape[0]):
        out = jnp.where(sel == m, table[m], out)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lookup(n_rows, table, idx):
    if n_rows <= SELECT_FWD_MAX_ROWS:
        return _select_sum(table, idx)
    return table[idx]


def _fwd(n_rows, table, idx):
    return _lookup(n_rows, table, idx), idx


def _bwd(n_rows, idx, g):
    R = idx.shape[0]
    dtype = g.dtype
    g = g.astype(jnp.float32)
    shape = (n_rows,) + g.shape[1:]

    if n_rows > ONEHOT_MAX_ROWS:
        # big tables: sort-based scatter-free histogram (ops/histogram.py)
        from sexy_raytracer_tpu.ops.histogram import dense_histogram

        dtable = dense_histogram(idx, g.reshape(R, -1), n_rows)
        return dtable.reshape(shape).astype(dtype), None

    chunk = min(max(ONEHOT_BLOCK_ELEMS // max(n_rows, 1), 8192), R)
    pad = (-R) % chunk
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        g = jnp.concatenate([g, jnp.zeros((pad,) + g.shape[1:], g.dtype)])
    n_chunks = idx.shape[0] // chunk

    def one_chunk(i_chunk, g_chunk):
        onehot = jax.nn.one_hot(i_chunk, n_rows, dtype=jnp.float32)  # [C, N]
        return jax.lax.dot_general(
            onehot,
            g_chunk,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if n_chunks == 1:
        return one_chunk(idx, g).astype(dtype), None

    idx_c = idx.reshape(n_chunks, chunk)
    g_c = g.reshape((n_chunks, chunk) + g.shape[1:])

    def body(acc, xs):
        i_chunk, g_chunk = xs
        return acc + one_chunk(i_chunk, g_chunk), None

    init = jnp.zeros(shape, jnp.float32)
    dtable, _ = jax.lax.scan(body, init, (idx_c, g_c))
    return dtable.astype(dtype), None


_lookup.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Large-atlas gather with sort-based histogram backward
# ---------------------------------------------------------------------------


def atlas_lookup(atlas, flat_idx):
    """``atlas.reshape(rows*W, C)[flat_idx]`` with a scatter-free backward.

    ``atlas``: [rows, W, C] float32 (rows = layers*height collapsed by the
    caller), ``flat_idx``: [R] int32 in [0, rows*W). Returns [R, C].

    The backward never scatters: it is the sorted segment-sum dense
    histogram of ops/histogram.py. Exact to f32 cumsum accumulation —
    well below MC gradient noise.
    """
    rows, w, c = atlas.shape
    return _atlas_lookup(rows, w, c, atlas, flat_idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _atlas_lookup(rows, w, c, atlas, flat_idx):
    return atlas.reshape(rows * w, c)[flat_idx]


def _atlas_fwd(rows, w, c, atlas, flat_idx):
    return _atlas_lookup(rows, w, c, atlas, flat_idx), flat_idx


def _atlas_bwd(rows, w, c, flat_idx, g):
    from sexy_raytracer_tpu.ops.histogram import dense_histogram

    dflat = dense_histogram(flat_idx, g.astype(jnp.float32), rows * w)
    return dflat.reshape(rows, w, c).astype(g.dtype), None


_atlas_lookup.defvjp(_atlas_fwd, _atlas_bwd)
