from sexy_raytracer_tpu.render.camera import Camera  # noqa: F401
from sexy_raytracer_tpu.render.integrator import trace_rays  # noqa: F401
from sexy_raytracer_tpu.render.renderer import render, render_image  # noqa: F401
