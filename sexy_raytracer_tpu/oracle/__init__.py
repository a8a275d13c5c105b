from sexy_raytracer_tpu.oracle.reference import Oracle  # noqa: F401
