from dgvcc_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    build_parallel_train_step,
)

from dgvcc_tpu.parallel.pp import make_pipe_mesh, pipelined_apply

__all__ = ["make_mesh", "shard_batch", "build_parallel_train_step",
           "make_pipe_mesh", "pipelined_apply"]
