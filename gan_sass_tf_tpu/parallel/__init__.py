"""Parallelism layer (NEW vs the single-device reference; SURVEY.md §1.2,
§2.3): data-parallel sharded-jit over an ICI device mesh, with an outer DCN
axis (size 1 today) so multi-slice scale-out is a config change."""

from gan_sass_tf_tpu.parallel.bootstrap import initialize_distributed
from gan_sass_tf_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "initialize_distributed"]
