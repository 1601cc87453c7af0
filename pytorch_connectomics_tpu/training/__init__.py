from .checkpoint import CheckpointManager, apply_state_resets  # noqa: F401
from .loop import NaNError, Trainer  # noqa: F401
from .optim import build_optimizer, build_schedule  # noqa: F401
from .state import TrainState, create_train_state, make_train_step, make_val_step  # noqa: F401
