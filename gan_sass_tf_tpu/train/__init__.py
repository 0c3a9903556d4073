"""Training driver (reference layer L6): fused alternating G/D step,
Experiment loop, checkpoint/resume, metrics."""

from gan_sass_tf_tpu.train.state import TrainState, create_train_state, make_optimizers
from gan_sass_tf_tpu.train.step import (
    build_eval_step,
    build_separate_fn,
    build_train_step,
)
from gan_sass_tf_tpu.train.experiment import Experiment

__all__ = [
    "TrainState", "create_train_state", "make_optimizers",
    "build_train_step", "build_eval_step", "build_separate_fn",
    "Experiment",
]
