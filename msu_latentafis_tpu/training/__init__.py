from . import losses, augment, synthetic_data
from .trainer import (TrainState, create_train_state, l2_train_step,
                      triplet_train_step, make_sharded_train_step)

__all__ = ["losses", "augment", "synthetic_data", "TrainState",
           "create_train_state", "l2_train_step", "triplet_train_step",
           "make_sharded_train_step"]
