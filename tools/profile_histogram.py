#!/usr/bin/env python
"""Micro-profile of dense_histogram internals on the axon TPU.

The bench step calls dense_histogram 8x (shade-atlas + tri-pack VJPs x 4
bounces) and profile_step3 shows ~13 ms per atlas-sized call — the whole
backward gap. This times each stage in isolation, at the real bench sizes,
to direct the fix.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import functools

import jax.numpy as jnp
import numpy as np

from sexy_raytracer_tpu.ops.histogram import dense_histogram, WIN


def force(x):
    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:16]))


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    force(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:48s} {dt:9.3f} ms", flush=True)
    return dt


R = 131072
CASES = [
    ("atlas (524k bins, C=8)", 524288, 8, R),
    ("tripack (3046 bins, C=16)", 3046, 16, R),
    ("atlas batched 4 bounces", 524288, 8, 4 * R),
]

key = jax.random.key(0)
for name, n_bins, C, r in CASES:
    # clustered indices like a real render (texel locality)
    base = jax.random.randint(jax.random.key(1), (r,), 0, n_bins // 40)
    idx = jnp.clip(base * 37 % n_bins, 0, n_bins - 1).astype(jnp.int32)
    vals = jnp.ones((r, C), jnp.float32)
    timeit(f"dense_histogram {name}", jax.jit(
        functools.partial(dense_histogram, n_bins=n_bins)), idx, vals)

# ---- stage-by-stage at the atlas size --------------------------------------
n_bins, C, r = 524288, 8, R
idx = jnp.clip(
    jax.random.randint(jax.random.key(1), (r,), 0, n_bins // 40) * 37 % n_bins,
    0, n_bins - 1,
).astype(jnp.int32)
vals = jnp.ones((r, C), jnp.float32)
perm = jnp.arange(r, dtype=jnp.int32)

sort1 = jax.jit(lambda i: jax.lax.sort([i, perm], num_keys=1))
sk, sperm = sort1(idx)
timeit("stage: sort1 [idx, perm]", sort1, idx)

gath = jax.jit(lambda v, p: v[p])
timeit("stage: vals[sperm] gather [131k,8]", gath, vals, sperm)
sv = gath(vals, sperm)

cs = jax.jit(lambda v: jnp.cumsum(v, axis=0))
timeit("stage: cumsum [131k,8] axis0", cs, sv)
S = cs(sv)

def compact(sk):
    is_end = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
    rank = jnp.cumsum(
        jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    ) - 1
    ckey = jnp.where(is_end, rank.astype(jnp.int32), r)
    return jax.lax.sort([ckey, perm], num_keys=1)

timeit("stage: sort2 (compaction)", jax.jit(compact), sk)
_, cperm = jax.jit(compact)(sk)

nw = -(-n_bins // WIN)

def windows(tex_u, seg):
    bounds = jnp.arange(nw, dtype=jnp.int32) * WIN
    starts = jnp.searchsorted(tex_u, bounds, side="left").astype(jnp.int32)
    take = jnp.minimum(
        starts[:, None] + jnp.arange(WIN, dtype=jnp.int32)[None, :], r - 1)
    flat = take.reshape(-1)
    return tex_u[flat], seg[flat]

tex_u = sk
seg = S
timeit("stage: searchsorted+window gather [256*2048]",
       jax.jit(windows), tex_u, seg)

# XLA scatter-add comparison
sc = jax.jit(lambda i, v: jnp.zeros((n_bins, C), jnp.float32).at[i].add(v))
timeit("compare: XLA scatter-add 131k -> 524k", sc, idx, vals)

# segment_sum comparison
ss = jax.jit(lambda i, v: jax.ops.segment_sum(v, i, num_segments=n_bins))
timeit("compare: jax.ops.segment_sum", ss, idx, vals)
