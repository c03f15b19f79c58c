from .state import TrainState, create_train_state
from .optim import make_optimizer_e, make_optimizer_d, lr_schedule
