from vfr_tpu.ops.proposals import (  # noqa: F401
    didemo_proposals,
    pooling_matrix,
    temporal_endpoint_features,
    sliding_windows,
    charades_window_bank,
    spans_to_seconds,
)
from vfr_tpu.ops.tiou import tiou, tiou_matrix  # noqa: F401
