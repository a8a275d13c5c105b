from sexy_raytracer_tpu.utils import mathx, rng, color, config, png  # noqa: F401
