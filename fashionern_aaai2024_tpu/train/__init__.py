from fashionern_aaai2024_tpu.train.schedule import (
    cosine_annealing_schedule,
    warmup_cosine_schedule,
)
from fashionern_aaai2024_tpu.train.state import CIRTrainState, create_train_state
from fashionern_aaai2024_tpu.train.step import build_train_step, grouped_bbc_loss
from fashionern_aaai2024_tpu.train.trainer import PLUGINS, TrainConfig, Trainer
