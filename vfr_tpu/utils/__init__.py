from vfr_tpu.utils.compile_cache import enable_compile_cache  # noqa: F401
from vfr_tpu.utils.logging import MetricsLogger  # noqa: F401
from vfr_tpu.utils.profiling import StepTimer, maybe_trace  # noqa: F401
