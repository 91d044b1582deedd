from .checkpoints import CheckpointIO, load_pytree, save_pytree  # noqa: F401
from .loop import train  # noqa: F401
from .scheduler import Scheduler, ScheduleState, anneal  # noqa: F401
from .trainer import (  # noqa: F401
    TrainState,
    compute_loss,
    init_train_state,
    make_render_cfg,
    make_train_step,
)
