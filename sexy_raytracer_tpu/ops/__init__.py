from sexy_raytracer_tpu.ops.intersect import HitRecord, find_hit, hit_data  # noqa: F401
