from vfr_tpu.ops.pallas.distance_kernel import pallas_fused_distances  # noqa: F401
from vfr_tpu.ops.pallas.lstm_kernel import pallas_lstm  # noqa: F401
