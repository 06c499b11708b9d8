from dgvcc_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    build_parallel_train_step,
)

from dgvcc_tpu.parallel.pp import (build_pipeline, make_pipe_mesh,
                                   pipelined_apply)

__all__ = ["make_mesh", "shard_batch", "build_parallel_train_step",
           "build_pipeline", "make_pipe_mesh", "pipelined_apply"]
