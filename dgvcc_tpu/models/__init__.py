"""Model zoo. Importing this package registers every model factory."""

from dgvcc_tpu.models import dg  # noqa: F401
from dgvcc_tpu.models import whitening  # noqa: F401
from dgvcc_tpu.models import baselines  # noqa: F401
from dgvcc_tpu.models import regressors  # noqa: F401

__all__ = ["dg", "whitening", "baselines", "regressors"]
