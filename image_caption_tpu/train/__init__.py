"""Training: state, jitted steps, loop, checkpoints, logging."""

from .loop import RLTrainer, Trainer, decode_split, make_trainer, train  # noqa: F401
from .state import TrainState, create_train_state, make_optimizer  # noqa: F401
