from physdock_tpu.parallel.mesh import batch_sharding, make_mesh, replicated  # noqa: F401
from physdock_tpu.parallel.tp import enable_tp, shard_rows, tp_active, use_tp  # noqa: F401
