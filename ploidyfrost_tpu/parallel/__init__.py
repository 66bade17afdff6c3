from .sharded import (
    make_mesh,
    build_sharded_count_step,
    build_sharded_em_step,
    hash_shard,
)
