from xnode_wan_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    round_up,
    shard_batch,
)
