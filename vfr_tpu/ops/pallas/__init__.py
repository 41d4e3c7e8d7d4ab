from vfr_tpu.ops.pallas.gru_kernel import pallas_gru  # noqa: F401
from vfr_tpu.ops.pallas.lstm_kernel import pallas_lstm  # noqa: F401
from vfr_tpu.ops.pallas.select_kernel import pallas_distance_select  # noqa: F401
