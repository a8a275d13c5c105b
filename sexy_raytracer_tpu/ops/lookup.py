"""Row gathers with TPU-friendly backward passes.

``jnp.take``'s VJP is a scatter-add, which TPUs execute serially per index —
for 131k rays x ~20 gathers x 4 bounces that dominates the whole backward
pass. ``table_lookup`` keeps the forward as a hardware gather but rewrites
the backward as a chunked one-hot matmul (dTable = sum_chunks onehot^T @ g),
which runs on the MXU. Used for all small-table lookups (triangle/sphere
record packs, material rows); the large texture atlas keeps the scatter-add
backward (one-hot over 500k+ rows is not materializable) but there is only
ONE atlas gather per bounce after the shading-pack redesign.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# tables with at most this many rows get the one-hot matmul backward
ONEHOT_MAX_ROWS = 16384
# rays per backward chunk: onehot block is [CHUNK, rows] f32
ONEHOT_CHUNK = 8192


def table_lookup(table, idx):
    """``table[idx]``: [N, K], [R] int32 -> [R, K]; idx must be in-range."""
    return _lookup(table.shape[0], table, idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lookup(n_rows, table, idx):
    return table[idx]


def _fwd(n_rows, table, idx):
    return table[idx], idx


def _bwd(n_rows, idx, g):
    R = idx.shape[0]
    dtype = g.dtype
    g = g.astype(jnp.float32)
    shape = (n_rows,) + g.shape[1:]

    if n_rows > ONEHOT_MAX_ROWS:
        dtable = jnp.zeros(shape, jnp.float32).at[idx].add(g)
        return dtable.astype(dtype), None

    chunk = min(ONEHOT_CHUNK, R)
    pad = (-R) % chunk
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        g = jnp.concatenate([g, jnp.zeros((pad,) + g.shape[1:], g.dtype)])
    n_chunks = idx.shape[0] // chunk
    idx_c = idx.reshape(n_chunks, chunk)
    g_c = g.reshape((n_chunks, chunk) + g.shape[1:])

    def body(acc, xs):
        i_chunk, g_chunk = xs
        onehot = jax.nn.one_hot(i_chunk, n_rows, dtype=jnp.float32)  # [C, N]
        acc = acc + jax.lax.dot_general(
            onehot,
            g_chunk,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, None

    init = jnp.zeros(shape, jnp.float32)
    dtable, _ = jax.lax.scan(body, init, (idx_c, g_c))
    return dtable.astype(dtype), None


_lookup.defvjp(_fwd, _bwd)
