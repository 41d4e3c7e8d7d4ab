from vfr_tpu.parallel.mesh import make_mesh  # noqa: F401
from vfr_tpu.parallel.sharding import (  # noqa: F401
    fuse_index_cat,
    fused_corpus_distances,
    fused_corpus_scores,
    query_sq_const,
    sharded_corpus_topk,
    sharded_corpus_topk_cat,
    replicated,
    shard_rows,
)
