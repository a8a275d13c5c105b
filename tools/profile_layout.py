"""Is [R,3] minor-dim padding the HBM killer? Compare elementwise chains."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

R = 131072
K = 40  # chain length


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:56s} {(time.time()-t0)/n*1e3:9.3f} ms")


# fused chain: one kernel, no intermediates
def chain_fused(x):
    for i in range(K):
        x = x * 1.0001 + 0.001
    return x

# forced materialization: optimization_barrier between steps
def chain_barrier(x):
    for i in range(K):
        x = x * 1.0001 + 0.001
        x = jax.lax.optimization_barrier(x)
    return x

x3 = jnp.ones((R, 3))
xT = jnp.ones((3, R))
x1 = jnp.ones((R,))
x128 = jnp.ones((R, 128))

timeit("fused    [R,3]", jax.jit(chain_fused), x3)
timeit("barrier  [R,3]", jax.jit(chain_barrier), x3)
timeit("fused    [3,R]", jax.jit(chain_fused), xT)
timeit("barrier  [3,R]", jax.jit(chain_barrier), xT)
timeit("barrier  [R]", jax.jit(chain_barrier), x1)
timeit("barrier  [R,128]", jax.jit(chain_barrier), x128)

# gather of [R,3] rows — like table_lookup of rec packs
tbl = jnp.ones((4096, 16))
idx = jax.random.randint(jax.random.key(0), (R,), 0, 4096)
timeit("gather [4096,16] -> [R,16]", jax.jit(lambda t, i: t[i] * 2.0), tbl, idx)

# unit_vector-ish: reductions along axis -1 of [R,3] with barrier
def norm_chain(x):
    for i in range(10):
        n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        x = x / jnp.maximum(n, 1e-9) + 0.001
        x = jax.lax.optimization_barrier(x)
    return x
timeit("norm-chain barrier [R,3] x10", jax.jit(norm_chain), x3)
timeit("norm-chain barrier [3,R](ax0) x10",
       jax.jit(lambda x: norm_chain(x.T).T), xT)
