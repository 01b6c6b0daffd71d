from vptr_tpu.train.state import (  # noqa: F401
    AETrainState,
    ModuleState,
    Stage2TrainState,
)
from vptr_tpu.train.trainer import Trainer  # noqa: F401
