from .mesh import make_mesh, batch_sharding, replicate  # noqa: F401
from .sharding import fsdp_shardings  # noqa: F401
