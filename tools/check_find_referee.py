"""f64 referee for kernel-vs-bruteforce mismatches + tile-coherent timing."""
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
scene_d = jax.device_put(scene)

R = 131072
W, H = cfg.width, cfg.height
TW, TH = 32, 16  # pixel tile -> 512-ray block


def tile_order_ids():
    """All pixel ids in 32x16-tile-major order."""
    xs = np.arange(0, W, TW)
    ys = np.arange(0, H, TH)
    ids = []
    for y0 in ys:
        for x0 in xs:
            yy, xx = np.meshgrid(
                np.arange(y0, min(y0 + TH, H)),
                np.arange(x0, min(x0 + TW, W)),
                indexing="ij",
            )
            ids.append((yy * W + xx).ravel())
    return np.concatenate(ids)


TILED = tile_order_ids()


def make_rays(seed, mode):
    key = jax.random.key(seed)
    if mode == "tiled":
        start = int(jax.random.randint(key, (), 0, (TILED.size - R) // 512)) * 512
        pid = jnp.asarray(TILED[start : start + R])
    elif mode == "rows":
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
f_bf = jax.jit(lambda s, o, d, t: find_hit(s, o, d, t, method="bruteforce"))

# --- referee: evaluate mismatched rays in f64 numpy --------------------
org, dirs, times = make_rays(1, "random")
p1, t1 = jax.block_until_ready(f_new(scene_d, org, dirs, times))
p0, t0 = jax.block_until_ready(f_bf(scene_d, org, dirs, times))
p1, t1, p0, t0 = map(np.asarray, (p1, t1, p0, t0))
orgn = np.asarray(org, np.float64)
dirn = np.asarray(dirs, np.float64)

v0 = np.asarray(scene.tri_v0, np.float64)
v1 = np.asarray(scene.tri_v1, np.float64)
v2 = np.asarray(scene.tri_v2, np.float64)
T = v0.shape[0]


def f64_tri_all(o, d):
    """closest tri in f64 from first principles (cross-product edge tests)."""
    n = np.cross(v1 - v0, v2 - v0)
    ndir = n @ d
    plane_ok = ndir <= -1.19209290e-07
    tt = -((n * (o - v0)).sum(1)) / np.where(plane_ok, ndir, -1.0)
    p = o[None, :] + tt[:, None] * d[None, :]
    e0 = ((np.cross(n, v1 - v0)) * (p - v0)).sum(1)
    e1 = ((np.cross(n, v2 - v1)) * (p - v1)).sum(1)
    e2 = ((np.cross(n, v0 - v2)) * (p - v2)).sum(1)
    ok = plane_ok & (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (tt >= 1e-3)
    tt = np.where(ok, tt, np.inf)
    i = np.argmin(tt)
    return (i if np.isfinite(tt[i]) else -1), tt[i]


mis = np.nonzero((p1 != p0))[0]
print(f"mismatches: {mis.size}/{R}")
agree_new = agree_bf = agree_neither = 0
margin = []
for i in mis[:300]:
    ref_i, ref_t = f64_tri_all(orgn[i], dirn[i])
    n1 = p1[i] if p1[i] < T else -1
    n0 = p0[i] if p0[i] < T else -1
    if ref_i == n1:
        agree_new += 1
    elif ref_i == n0:
        agree_bf += 1
    else:
        agree_neither += 1
print(f"referee(300 sampled): new-correct {agree_new}, bf-correct {agree_bf}, "
      f"neither {agree_neither}")

# --- timing with proper 2D tiles ---------------------------------------
for mode in ("tiled", "rows", "random"):
    sets = [(scene_d, *make_rays(s, mode)) for s in range(4)]
    device_time(f"new kernel {mode}", f_new, sets)
