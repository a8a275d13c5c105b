"""Inspect compiled-HLO cost analysis of the forward trace."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from sexy_raytracer_tpu.models import presets
from sexy_raytracer_tpu.render.camera import Camera
from sexy_raytracer_tpu.render.renderer import render_pixels

scene, cfg = presets.masterchief()
camera = Camera.from_config(cfg.camera, cfg.aspect)
scene = jax.device_put(scene)
background = jnp.asarray(cfg.background, jnp.float32)

R = 131072
pix = jnp.arange(R, dtype=jnp.int32) % (cfg.width * cfg.height)

f = jax.jit(lambda s, c, p: render_pixels(
    s, c, p, jnp.int32(0), jax.random.key(1), background,
    width=cfg.width, height=cfg.height, spb=1, spp_total=1,
    max_bounce=4, method="auto"))

lowered = f.lower(scene, camera, pix)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
for k in sorted(ca):
    v = ca[k]
    if isinstance(v, float) and v > 1e6:
        print(f"{k:40s} {v:.3e}")
print()
print("flops:", ca.get("flops"), " bytes accessed:", ca.get("bytes accessed"))

# count expensive-op occurrences in the optimized HLO
txt = compiled.as_text()
import re
from collections import Counter
c = Counter()
for m in re.finditer(r"^\s*(?:ROOT )?%?[\w.-]+ = (\w+)\(", txt, re.M):
    pass
for op in ["gather", "scatter", "sort", "while", "custom-call", "dot",
           "dynamic-slice", "dynamic-update-slice", "reduce", "transpose",
           "concatenate", "fusion", "copy", "all-reduce", "rng"]:
    n = len(re.findall(rf"= \S* {op}\(", txt))
    print(f"{op:24s} {n}")
print("total lines:", len(txt.splitlines()))

# dump top fusion shapes
big = re.findall(r"= (\S+)\[([\d,]*)\]\S* fusion\(", txt)
from collections import Counter
sizes = Counter()
for dtype, shape in big:
    n = 1
    for d in shape.split(","):
        if d:
            n *= int(d)
    sizes[(dtype, shape)] += 1
print("\nlargest fusion output shapes:")
for (dtype, shape), cnt in sorted(sizes.items(), key=lambda kv: -eval("*".join(kv[0][1].split(",")) if kv[0][1] else "1"))[:15]:
    print(f"  {dtype}[{shape}] x{cnt}")
with open("/tmp/trace_hlo.txt", "w") as fh:
    fh.write(txt)
print("\nHLO written to /tmp/trace_hlo.txt")
