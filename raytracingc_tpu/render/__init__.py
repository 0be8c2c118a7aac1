from raytracingc_tpu.render.integrator import trace_paths  # noqa: F401
from raytracingc_tpu.render.renderer import render, render_image  # noqa: F401
from raytracingc_tpu.render.image import tonemap_to_bytes, write_bmp  # noqa: F401
