from vfr_tpu.models.mcn import (  # noqa: F401
    init_model_params,
    embed_queries,
    embed_queries_multi,
    embed_moments,
    fused_distances,
    cross_distances,
    Model,
)
