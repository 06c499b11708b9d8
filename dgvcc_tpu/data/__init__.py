"""Data pipeline: offline preprocessing + online datasets/loader."""

from dgvcc_tpu.data.datasets import (  # noqa: F401
    CrowdDataset,
    DensityMapDataset,
    DenClsDataset,
    BayesianDataset,
)
from dgvcc_tpu.data.loader import DataLoader  # noqa: F401
import dgvcc_tpu.data.jhu  # noqa: F401  (registers JHU domain datasets)
