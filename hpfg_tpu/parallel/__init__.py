from hpfg_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    get_mesh,
    make_mesh,
    replicated,
    shard_batch,
)
