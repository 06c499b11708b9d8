"""Classic counting baselines (reference models/baselines/)."""

from dgvcc_tpu.models.baselines import csrnet, mcnn, bl_vgg, sasnet  # noqa: F401
from dgvcc_tpu.models.baselines import dssinet, cctrans  # noqa: F401
