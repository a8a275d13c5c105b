"""Correctness + speed check of the clustered find kernel on TPU."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.ops.intersect import find_hit
from tputime import device_time

scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)
scene = jax.device_put(scene)

R = 131072
W, H = cfg.width, cfg.height


def make_rays(seed, coherent):
    key = jax.random.key(seed)
    if coherent:
        # tile-major pixel order: 32x16 pixel tiles, consecutive rays
        start = jax.random.randint(key, (), 0, W * H - R)
        pid = start + jnp.arange(R)
    else:
        pid = jax.random.randint(key, (R,), 0, W * H)
    k2 = jax.random.split(key, 3)
    u = ((pid % W) + jax.random.uniform(k2[0], (R,))) / (W - 1)
    v = ((H - pid // W) + jax.random.uniform(k2[1], (R,))) / (H - 1)
    lens = jax.random.uniform(k2[2], (R, 3))
    org, dirs, times = camera.get_rays(u, v, lens)
    return tuple(map(jax.block_until_ready, (org, dirs, times)))


f_new = jax.jit(lambda s, o, d, t: find_hit(s, o, d, t, method="pallas"))
f_nocull = jax.jit(lambda s, o, d, t: find_hit(s, o, d, t, method="pallas_nocull"))
f_bf = jax.jit(lambda s, o, d, t: find_hit(s, o, d, t, method="bruteforce"))
f_mxu = jax.jit(lambda s, o, d, t: find_hit(s, o, d, t, method="pallas_mxu"))

# correctness vs bruteforce on primary rays + random rays
for name, coh in (("coherent", True), ("random", False)):
    org, dirs, times = make_rays(0 if coh else 1, coh)
    p1, t1 = jax.block_until_ready(f_new(scene, org, dirs, times))
    p0, t0 = jax.block_until_ready(f_bf(scene, org, dirs, times))
    p1, t1, p0, t0 = map(np.asarray, (p1, t1, p0, t0))
    mismatch = (p1 != p0)
    # t ties between primitives are acceptable; compare t where both hit
    both = (p1 >= 0) & (p0 >= 0)
    t_close = np.allclose(t1[both], t0[both], rtol=1e-5, atol=1e-5)
    print(f"{name}: prim mismatches {mismatch.sum()}/{R} "
          f"(hits {(p0 >= 0).sum()}), t allclose={t_close}")
    if mismatch.sum():
        bad = np.nonzero(mismatch)[0][:10]
        for i in bad:
            print(f"  ray {i}: new prim {p1[i]} t {t1[i]:.6f} | "
                  f"bf prim {p0[i]} t {t0[i]:.6f}")

# speed (device time, varied inputs)
sets_coh = [make_rays(s, True) for s in range(4)]
sets_rnd = [make_rays(s, False) for s in range(4)]
argsets_c = [(scene, *r) for r in sets_coh]
argsets_r = [(scene, *r) for r in sets_rnd]
device_time("new kernel coherent primary", f_new, argsets_c)
device_time("new kernel random pixels", f_new, argsets_r)
device_time("new kernel nocull", f_nocull, argsets_c)
device_time("old MXU kernel", f_mxu, argsets_c)
