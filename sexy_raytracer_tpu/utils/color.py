"""Radiance accumulation -> displayable image.

Reproduces the reference's output transform (reference color.h:25-41):
divide by samples-per-pixel, gamma-2 encode via sqrt, scale by
``256 * clamp(c, 0, 0.999)``, quantize to uint8, alpha = 255.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def resolve(accum_rgb, num_samples):
    """Sum-of-samples radiance ``[..., 3]`` -> float image in [0, 1).

    Gamma-2 encode via sqrt as in reference color.h:30-33.
    """
    scale = 1.0 / num_samples
    c = jnp.sqrt(jnp.clip(accum_rgb * scale, 0.0, None))
    return jnp.clip(c, 0.0, 0.999)


def to_uint8(resolved_rgb):
    """Quantize a resolved [0,1) image exactly like reference color.h:37-39."""
    arr = np.asarray(resolved_rgb)
    return (256.0 * np.clip(arr, 0.0, 0.999)).astype(np.uint8)


def to_rgba8(resolved_rgb):
    """RGBA8 framebuffer with alpha=255 (reference color.h:35-40)."""
    rgb = to_uint8(resolved_rgb)
    alpha = np.full(rgb.shape[:-1] + (1,), 255, dtype=np.uint8)
    return np.concatenate([rgb, alpha], axis=-1)
