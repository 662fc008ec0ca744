from .networks import Networks
from .state import TrainState, create_train_state, make_optimizer
from .step import make_train_step

__all__ = ['Networks', 'TrainState', 'create_train_state',
           'make_optimizer', 'make_train_step']
