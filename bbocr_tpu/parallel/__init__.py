from bbocr_tpu.parallel.mesh import MeshConfig, make_mesh
from bbocr_tpu.parallel.sharding import (
    batch_sharding,
    param_shardings,
    replicate_sharding,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "replicate_sharding",
]
