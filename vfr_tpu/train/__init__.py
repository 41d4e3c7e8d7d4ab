from vfr_tpu.train.loss import compute_loss, infonce_loss, ranking_loss  # noqa: F401
from vfr_tpu.train.optim import make_optimizer  # noqa: F401
from vfr_tpu.train.step import make_train_step  # noqa: F401
