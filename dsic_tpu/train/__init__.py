from dsic_tpu.train.state import TrainState, create_train_state
from dsic_tpu.train.steps import make_train_step, make_eval_step
from dsic_tpu.train.trainer import Trainer, validate

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_eval_step", "Trainer", "validate"]
