from dgvcc_tpu.core.registry import Registry, MODELS, LOSSES, DATASETS, OPTIMIZERS, SCHEDULERS
from dgvcc_tpu.core.config import Config, load_config

__all__ = [
    "Registry",
    "MODELS",
    "LOSSES",
    "DATASETS",
    "OPTIMIZERS",
    "SCHEDULERS",
    "Config",
    "load_config",
]
