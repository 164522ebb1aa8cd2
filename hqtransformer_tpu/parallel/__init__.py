from .mesh import (make_mesh, stage2_param_sharding,  # noqa: F401
                   batch_sharding, replicated)
