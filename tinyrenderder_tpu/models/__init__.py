from tinyrenderder_tpu.models.mesh import Mesh, SubMesh, Material  # noqa: F401
from tinyrenderder_tpu.models.manager import ModelManager  # noqa: F401
