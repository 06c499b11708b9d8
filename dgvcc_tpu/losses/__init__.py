"""Loss zoo. Importing registers 'mse' and 'bl' in the LOSSES registry."""

from dgvcc_tpu.losses.count import MSECountLoss, mse_count_loss
from dgvcc_tpu.losses.bayesian import BayesianLoss
from dgvcc_tpu.losses.misc import jsd_loss, lw_loss, ortho_loss, sim_loss, triplet_loss

__all__ = [
    "MSECountLoss",
    "mse_count_loss",
    "BayesianLoss",
    "jsd_loss",
    "lw_loss",
    "ortho_loss",
    "sim_loss",
    "triplet_loss",
]
