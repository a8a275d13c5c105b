"""sexy-raytracer-tpu: a TPU-native differentiable path tracer in JAX.

A from-scratch re-design of the capability set of swishersnaaake/sexy-raytracer
(a single-threaded header-only C++ CPU ray tracer) as an idiomatic
JAX/XLA/Pallas framework:

  * flat SoA scenes (the reference's ``hittableIndexed`` concept done right),
  * wavefront path tracing as a fixed-depth ``lax.scan``,
  * Pallas hit-finding kernels (intersection = non-differentiable index
    search; hit data recomputed differentiably in jnp),
  * ``jax.sharding`` data-parallel rendering over device meshes,
  * end-to-end pixel gradients for inverse rendering.

Reference parity notes cite files as ``<file>:<line>`` into /root/reference.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: first compile of a render/train step is
# 20-40s+; every CLI/test/bench entry should reuse it. Must be set before
# jax initializes a backend, which importing this package precedes. The
# location honors XDG_CACHE_HOME / the user's home (ADVICE r3: a hardcoded
# /root path silently no-ops for non-root users); setdefault keeps any
# explicit user choice.
_cache_root = _os.environ.get("XDG_CACHE_HOME") or _os.path.join(
    _os.path.expanduser("~"), ".cache"
)
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", _os.path.join(_cache_root, "jax")
)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from sexy_raytracer_tpu.utils.config import RenderConfig  # noqa: F401
from sexy_raytracer_tpu.render.camera import Camera  # noqa: F401
