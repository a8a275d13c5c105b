"""Trainable-parameter partitioning for inverse rendering.

The gradient targets of BASELINE config 5: PBR texture maps (the atlas) and
material factors, plus sphere positions. Parameters are a plain dict of
scene-field-name -> array; ``merge_params`` rebuilds a consistent SceneData
(re-deriving the precomputed triangle pack when geometry changes, so
gradients through derived data stay correct).
"""

from __future__ import annotations

import jax.numpy as jnp

from sexy_raytracer_tpu.models.scene import SceneData, prepare_triangles

# shade_atlas = the baked 8-channel map pack (albedo/normal/metallic/
# roughness jointly — the texture recovery target); factors; checker/solid
# albedo colors; sphere centers (moving spheres train both endpoints).
# Triangle vertices are includable ("tri_v0"...) for geometry optimization.
DEFAULT_TRAINABLE = (
    "shade_atlas",
    "mat_base_color",
    "mat_metallic",
    "mat_roughness",
    "mat_albedo_c0",
    "mat_albedo_c1",
    "sph_c0",
    "sph_c1",
)

_GEOMETRY_FIELDS = {"tri_v0", "tri_v1", "tri_v2"}


def extract_params(scene: SceneData, names=DEFAULT_TRAINABLE) -> dict:
    return {name: getattr(scene, name) for name in names}


def merge_params(scene: SceneData, params: dict) -> SceneData:
    scene = scene._replace(**params)
    if _GEOMETRY_FIELDS & set(params):
        tri_n, tri_d, tri_q, tri_c = prepare_triangles(
            scene.tri_v0, scene.tri_v1, scene.tri_v2
        )
        scene = scene._replace(tri_n=tri_n, tri_d=tri_d, tri_q=tri_q, tri_c=tri_c)
    return scene
