from ctdd_tpu.training.state import TrainState, create_train_state  # noqa: F401
from ctdd_tpu.training.train_step import (  # noqa: F401
    Standard,
    get_train_step,
    make_train_step,
)
from ctdd_tpu.training.optimizers import get_optimizer  # noqa: F401
