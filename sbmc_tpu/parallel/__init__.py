from sbmc_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
)
from sbmc_tpu.parallel.tiles import split_tiles, merge_tiles, pad_back  # noqa: F401
