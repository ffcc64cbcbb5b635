from .bucketing import pow2_bucket_width
from .cache import enable_compile_cache
from .mesh import (batch_sharding, make_mesh, maybe_init_distributed,
                   replicated, resolve_mesh_shape)
from .precision import Policy, get_policy
