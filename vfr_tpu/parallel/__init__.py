from vfr_tpu.parallel.mesh import make_mesh  # noqa: F401
from vfr_tpu.parallel.sharding import (  # noqa: F401
    fused_corpus_distances,
    sharded_corpus_topk,
    replicated,
    shard_rows,
)
