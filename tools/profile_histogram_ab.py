#!/usr/bin/env python
"""A/B the direct vs sorted dense_histogram on REAL backward indices
(/tmp/bwd_indices.npz from tools/dump_backward_indices.py) on the TPU."""
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

from sexy_raytracer_tpu.ops.histogram import (
    dense_histogram,
    dense_histogram_sorted,
)


def force(x):
    return float(jnp.sum(x.ravel()[:16]))


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    force(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:52s} {dt:9.3f} ms", flush=True)
    return out, dt


d = np.load("/tmp/bwd_indices.npz")
nb_atlas = int(d["n_bins_atlas"])
nb_tri = int(d["n_bins_tri"])

for b in (0, 2):
    idx = jnp.asarray(d[f"atlas_b{b}"])
    alive = np.asarray(d[f"alive_b{b}"])
    vals = jnp.asarray(
        np.where(alive[:, None], 1.0, 0.0)
        * np.random.default_rng(0).normal(size=(len(alive), 8))
    ).astype(jnp.float32)
    o1, _ = timeit(f"direct  atlas b{b} (524k bins, C=8)", jax.jit(
        functools.partial(dense_histogram, n_bins=nb_atlas)), idx, vals)
    o2, _ = timeit(f"sorted  atlas b{b}", jax.jit(
        functools.partial(dense_histogram_sorted, n_bins=nb_atlas)), idx, vals)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    rel = err / max(1e-9, float(jnp.max(jnp.abs(o2))))
    print(f"   match: maxabs {err:.3e} rel {rel:.2e}")

    tid = jnp.asarray(d[f"tri_b{b}"])
    tvals = jnp.asarray(
        np.where(alive[:, None], 1.0, 0.0)
        * np.random.default_rng(1).normal(size=(len(alive), 16))
    ).astype(jnp.float32)
    o1, _ = timeit(f"direct  tripack b{b} (3042 bins, C=16)", jax.jit(
        functools.partial(dense_histogram, n_bins=nb_tri)), tid, tvals)
    o2, _ = timeit(f"sorted  tripack b{b}", jax.jit(
        functools.partial(dense_histogram_sorted, n_bins=nb_tri)), tid, tvals)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    rel = err / max(1e-9, float(jnp.max(jnp.abs(o2))))
    print(f"   match: maxabs {err:.3e} rel {rel:.2e}")

# adversarial: uniform random indices, all live
rng = np.random.default_rng(3)
idx = jnp.asarray(rng.integers(0, nb_atlas, size=131072).astype(np.int32))
vals = jnp.asarray(rng.normal(size=(131072, 8)).astype(np.float32))
timeit("direct  atlas UNIFORM (worst case)", jax.jit(
    functools.partial(dense_histogram, n_bins=nb_atlas)), idx, vals)
timeit("sorted  atlas UNIFORM", jax.jit(
    functools.partial(dense_histogram_sorted, n_bins=nb_atlas)), idx, vals)
