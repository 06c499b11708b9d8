from dgvcc_tpu.ops.dmap import (
    gaussian_density_adaptive_np,
    gaussian_density_fixed_np,
    gaussian_density_jax,
    gaussian_density_pallas,
)

__all__ = [
    "gaussian_density_adaptive_np",
    "gaussian_density_fixed_np",
    "gaussian_density_jax",
    "gaussian_density_pallas",
]
