from .mesh import (make_mesh, shard_batch, replicate,
                   make_parallel_train_step, make_parallel_render)
from .audit import audit_collectives, audit_step, param_bytes
