from pathtrace_tpu.models.scene import Scene, Material, Spheres, Triangles
from pathtrace_tpu.models import procedural

__all__ = ["Scene", "Material", "Spheres", "Triangles", "procedural"]
