"""Measure TPU primitives for the atlas-gradient histogram problem.

NOTE: the axon backend memoizes identical executions, so every call must
see fresh inputs — we pre-stage V variants and cycle through them.

dAtlas[texel, c] = sum over rays hitting texel of g[ray, c]
R = 131072 rays/bounce, texels = 786432 (3x512x512), C = 8.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

R = 131072
N = 786432
C = 8
V = 6  # input variants to defeat memoization

keys = [jax.random.key(i) for i in range(V)]
gs = [jax.block_until_ready(jax.random.normal(k, (R, C), jnp.float32)) for k in keys]
idx_u = [jax.block_until_ready(jax.random.randint(k, (R,), 0, N, dtype=jnp.int32)) for k in keys]
idx_c = [jax.block_until_ready(jax.random.randint(k, (R,), 0, 2000, dtype=jnp.int32)) for k in keys]
idx_s = [jax.block_until_ready(jnp.sort(i)) for i in idx_u]


def timeit(name, fn, argsets, n=12):
    out = fn(*argsets[0])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(n):
        out = fn(*argsets[1 + i % (len(argsets) - 1)])
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.time()-t0)/n*1e3:9.2f} ms", flush=True)


# 1. plain scatter-add
f_scatter = jax.jit(lambda i, v: jnp.zeros((N, C)).at[i].add(v))
timeit("scatter-add uniform", f_scatter, [(i, g) for i, g in zip(idx_u, gs)])
timeit("scatter-add concentrated", f_scatter, [(i, g) for i, g in zip(idx_c, gs)])
timeit("scatter-add sorted", f_scatter, [(i, g) for i, g in zip(idx_s, gs)])

# 2. sort
def do_sort(i, v):
    ops = [i] + [v[:, k] for k in range(C)]
    out = jax.lax.sort(ops, num_keys=1)
    return out[0], jnp.stack(out[1:], axis=1)
f_sort = jax.jit(do_sort)
timeit("lax.sort key + 8 payload cols", f_sort, [(i, g) for i, g in zip(idx_u, gs)])

def do_sort_rank(i, v):
    r = jnp.arange(R, dtype=jnp.int32)
    sk, sr = jax.lax.sort([i, r], num_keys=1)
    return sk, v[sr]
timeit("lax.sort key+rank, gather [R,8]", jax.jit(do_sort_rank), [(i, g) for i, g in zip(idx_u, gs)])

# 3. cumsum
timeit("cumsum [R,8]", jax.jit(lambda v: jnp.cumsum(v, axis=0)), [(g,) for g in gs])

# 4. searchsorted all texels into sorted keys
f_ss = jax.jit(lambda k_: jnp.searchsorted(k_, jnp.arange(N, dtype=jnp.int32), side="right"))
timeit("searchsorted 786k into 131k", f_ss, [(i,) for i in idx_s], n=6)

# 5. one-hot matmul bf16 (current approach, rows=1536, W=512)
rows, W = 1536, 512
def onehot_bf16(i, v):
    row = i // W
    col = i - row * W
    chunk = 4096
    nch = R // chunk
    def body(acc, xs):
        r_, c_, g_ = xs
        ohc = jax.nn.one_hot(c_, W, dtype=jnp.bfloat16)
        tmp = (ohc[:, :, None] * g_.astype(jnp.bfloat16)[:, None, :]).reshape(chunk, W * C)
        ohr = jax.nn.one_hot(r_, rows, dtype=jnp.bfloat16)
        return acc + jax.lax.dot_general(
            ohr, tmp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), None
    acc, _ = jax.lax.scan(body, jnp.zeros((rows, W * C), jnp.float32),
                          (row.reshape(nch, chunk), col.reshape(nch, chunk),
                           v.reshape(nch, chunk, C)))
    return acc
timeit("one-hot matmul bf16", jax.jit(onehot_bf16), [(i, g) for i, g in zip(idx_u, gs)], n=6)

# 6. gather fwd
tbl = jax.block_until_ready(jax.random.normal(jax.random.key(99), (N, C)))
timeit("gather fwd [786k,8]", jax.jit(lambda t, i: t[i] * 2.0), [(tbl, i) for i in idx_u])

# 7. full sort-free pipeline candidate:
#    sort -> cumsum -> boundary -> scatter-add to E (sorted unique idx) -> diff
def sorted_hist(i, v):
    r = jnp.arange(R, dtype=jnp.int32)
    sk, sr = jax.lax.sort([i, r], num_keys=1)
    sv = v[sr]
    S = jnp.cumsum(sv, axis=0)
    is_end = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
    # E[texel] = S at segment end; scatter (unique idx) then diff against
    # running previous: dFlat[v] = E[v] - max-prefix(E)[v-1] — implement via
    # scatter of both S_end and S_before_start keyed by texel.
    S_end = jnp.where(is_end[:, None], S, 0.0)
    start_mask = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    S_prev = jnp.where(start_mask[:, None],
                       jnp.concatenate([jnp.zeros((1, C)), S[:-1]], axis=0), 0.0)
    seg = jnp.zeros((N, C)).at[sk].add(S_end - S_prev)
    return seg
timeit("sort+cumsum+scatter(sorted unique)", jax.jit(sorted_hist),
       [(i, g) for i, g in zip(idx_u, gs)], n=6)
timeit("  same, concentrated idx", jax.jit(sorted_hist),
       [(i, g) for i, g in zip(idx_c, gs)], n=6)
