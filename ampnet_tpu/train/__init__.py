from ampnet_tpu.train.losses import (
    orthogonality_regularizer,
    weighted_cross_entropy,
)
from ampnet_tpu.train.state import AMPTrainState, create_train_state
from ampnet_tpu.train.step import eval_step, make_step_fns, train_step
