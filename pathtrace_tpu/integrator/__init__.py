from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.integrator.render import render, render_image

__all__ = ["IntegratorConfig", "render", "render_image"]
