from dgvcc_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    build_parallel_train_step,
)

__all__ = ["make_mesh", "shard_batch", "build_parallel_train_step"]
