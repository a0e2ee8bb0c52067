from selavi_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from selavi_tpu.parallel.dist import (
    init_distributed_mode,
    init_signal_handler,
    signal_received,
    sync_hosts,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "init_distributed_mode",
    "init_signal_handler",
    "signal_received",
    "sync_hosts",
]
