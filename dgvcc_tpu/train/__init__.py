from dgvcc_tpu.train.optim import build_optimizer, build_scheduler
from dgvcc_tpu.train.state import TrainState, create_train_state

__all__ = ["build_optimizer", "build_scheduler", "TrainState", "create_train_state"]
