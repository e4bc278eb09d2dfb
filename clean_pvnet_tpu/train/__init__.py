from clean_pvnet_tpu.train.loss import pvnet_loss, smooth_l1  # noqa: F401
from clean_pvnet_tpu.train.optim import make_optimizer, multistep_schedule  # noqa: F401
from clean_pvnet_tpu.train.state import TrainState, create_train_state  # noqa: F401
from clean_pvnet_tpu.train.trainer import Trainer, pvnet_step_fns  # noqa: F401
from clean_pvnet_tpu.train.checkpoint import CheckpointIO  # noqa: F401
from clean_pvnet_tpu.train.recorder import Recorder, SmoothedValue  # noqa: F401
