from .state import TrainState, create_optimizer, poly_lr_schedule, create_train_state
from .base import make_base_train_step, make_eval_step
from .ft import make_ft_train_step
