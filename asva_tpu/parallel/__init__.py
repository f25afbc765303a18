from .mesh import (make_gen_mesh, make_mesh, batch_sharding,  # noqa: F401
                   replicate)
from .sharding import fsdp_shardings  # noqa: F401
