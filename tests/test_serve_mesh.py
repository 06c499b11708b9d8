"""Data-parallel serving: VideoCounter over a device mesh.

The sharded serving path (serve.py, mesh=...) must produce the same
per-frame counts as single-device serving — the batch dim shards over
the 'data' axis, weights replicate, nothing else changes. Runs on the
conftest 8-device virtual CPU mesh. The reference has no serving story
at all (closest analog: the serial --task test loop,
trainers/trainer.py:90-103), so the contract here is purely internal
consistency.
"""

import jax.numpy as jnp
import numpy as np

from dgvcc_tpu.parallel import make_mesh
from dgvcc_tpu.serve import VideoCounter


def _frames(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)


def test_sharded_counts_match_single_device():
    frames = _frames(8, 96, 128)
    single = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32)
    sharded = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                           mesh=make_mesh(8))
    # same init (PRNGKey(0) in from_checkpoint) → same weights
    c1 = single.count_frames(frames)
    c2 = sharded.count_frames(frames)
    np.testing.assert_allclose(c2, c1, rtol=1e-5, atol=1e-5)


def test_sharded_ragged_batch_pads_and_slices():
    # batch 5 on an 8-way mesh: pad to 8, counts slice back to 5
    frames = _frames(5, 64, 64, seed=1)
    single = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32)
    sharded = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                           mesh=make_mesh(8))
    c1 = single.count_frames(frames)
    c2 = sharded.count_frames(frames)
    assert len(c2) == 5
    np.testing.assert_allclose(c2, c1, rtol=1e-5, atol=1e-5)


def test_sharded_quantized_counts_match_single_device():
    """quantize=True + mesh: the int8 serving graph shards its frame
    batch over the data axis with the folded weights replicated
    (serve.py:167-173) — per-frame counts must equal single-device int8."""
    import jax.numpy as _jnp  # noqa: F811

    frames = _frames(8, 96, 128, seed=3)
    kw = dict(dtype=jnp.float32, quantize=True, calib_frames=frames[:2],
              mem_size=8, mem_dim=16)
    single = VideoCounter.from_checkpoint("final", None, **kw)
    sharded = VideoCounter.from_checkpoint("final", None,
                                           mesh=make_mesh(8), **kw)
    assert sharded.quantized is not None
    c1 = single.count_frames(frames)
    c2 = sharded.count_frames(frames)
    np.testing.assert_allclose(c2, c1, rtol=1e-5, atol=1e-4)


def test_sharded_tiled_path():
    # force the tiled path (threshold below the frame size); tiles of a
    # frame stay on its shard, per-frame tile-sums happen inside jit
    frames = _frames(2, 100, 180, seed=2)
    kw = dict(dtype=jnp.float32, tile_size=64, tile_threshold=96)
    single = VideoCounter.from_checkpoint("base", None, **kw)
    sharded = VideoCounter.from_checkpoint("base", None, mesh=make_mesh(8),
                                           **kw)
    c1 = single.count_frames(frames)
    c2 = sharded.count_frames(frames)
    np.testing.assert_allclose(c2, c1, rtol=1e-5, atol=1e-5)


def test_spatial_sharded_counts_match_single_device():
    """shard='spatial': each frame's HEIGHT slices over the mesh — XLA
    GSPMD spatially partitions every conv (halo rows as
    collective-permutes) and the per-frame density sum is the only
    cross-shard reduce. Counts must equal single-device whole-frame
    serving. This is the B=1 giant-frame deployment regime that
    batch-DP leaves 7/8 chips idle on."""
    frames = _frames(1, 192, 160, seed=4)
    single = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32)
    spatial = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                           mesh=make_mesh(8),
                                           shard="spatial")
    c1 = single.count_frames(frames)
    c2 = spatial.count_frames(frames)
    np.testing.assert_allclose(c2, c1, rtol=1e-5, atol=1e-5)
    # no batch padding in spatial mode: odd batch sizes pass through
    frames3 = _frames(3, 96, 128, seed=5)
    np.testing.assert_allclose(spatial.count_frames(frames3),
                               single.count_frames(frames3),
                               rtol=1e-5, atol=1e-5)


def test_spatial_sharded_partitions_do_not_gather():
    """The compiled spatial program must keep the frame sharded: halo
    collective-permutes present, no all-gather of activations (an
    all-gather would mean the 'sharded' forward secretly rebuilt the
    whole frame on every chip)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    vc = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                      mesh=make_mesh(8), shard="spatial")
    frames, _ = vc._pad(_frames(1, 192, 160, seed=4))
    valid = np.tile(np.int32([192, 160]), (1, 1))
    hlo = vc._infer.lower(vc._weights(), jnp.asarray(frames),
                          jnp.asarray(valid)).compile().as_text()
    assert hlo.count("collective-permute") > 0
    assert hlo.count("all-gather") == 0


def test_spatial_sharded_quantized_artifact(tmp_path):
    """spatial mode composes with the int8 artifact deploy path."""
    from dgvcc_tpu.nn.quant_io import save_quantized

    frames = _frames(2, 96, 128, seed=6)
    built = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                         quantize=True, calib_frames=frames)
    path = str(tmp_path / "base_sp.i8")
    save_quantized(built.quantized, path, "base")

    single = VideoCounter.from_artifact(path, dtype=jnp.float32)
    spatial = VideoCounter.from_artifact(path, dtype=jnp.float32,
                                         mesh=make_mesh(8), shard="spatial")
    np.testing.assert_allclose(spatial.count_frames(frames),
                               single.count_frames(frames),
                               rtol=1e-5, atol=1e-4)


def test_spatial_tiled_path_pads_indivisible_tile_count():
    """Tiled path under spatial sharding: a tile count that doesn't
    divide the mesh (3x3=9 tiles on 8 devices) pads with zero tiles
    whose zero valid extents mask them out — counts equal the
    single-device tiled path (review finding: used to crash with a
    divisibility ValueError at dispatch)."""
    frames = _frames(2, 180, 180, seed=7)
    kw = dict(dtype=jnp.float32, tile_size=64, tile_threshold=96)
    single = VideoCounter.from_checkpoint("base", None, **kw)
    spatial = VideoCounter.from_checkpoint("base", None, mesh=make_mesh(8),
                                           shard="spatial", **kw)
    c1 = single.count_frames(frames)
    c2 = spatial.count_frames(frames)
    np.testing.assert_allclose(c2, c1, rtol=1e-5, atol=1e-5)


def test_spatial_whole_frame_pads_height_to_axis():
    """Whole-frame spatial path on a mesh size the 64-bucket doesn't
    cover (3 devices): H pads to lcm(bucket, n)=192 instead of crashing
    on jit divisibility. When the padded height already divides the
    axis, sharding is LOSSLESS (exact equality); when the lcm adds
    extra rows, the count shifts only by the model's padding
    sensitivity (bilinear upsample grids depend on the padded size —
    a property of bucketed serving itself, not of the sharding)."""
    spatial = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                           mesh=make_mesh(3),
                                           shard="spatial")
    single = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32)

    # H=192 divides both bucket and axis: bit-for-bit identical padding
    exact = _frames(1, 192, 64, seed=8)
    np.testing.assert_allclose(spatial.count_frames(exact),
                               single.count_frames(exact),
                               rtol=1e-5, atol=1e-5)

    # H=100 → spatial pads to 192, single to 128: no crash, and the
    # count stays within the padding-sensitivity envelope
    ragged = _frames(1, 100, 64, seed=8)
    c_sp = spatial.count_frames(ragged)
    c_1 = single.count_frames(ragged)
    np.testing.assert_allclose(c_sp, c_1, rtol=0.1, atol=0.05)


def test_cli_builds_spatial_mesh_from_config(tmp_path):
    """`serve_shard: spatial` + `mesh: {spatial: 8}` must actually
    engage the mesh (review finding: the CLI only read mesh.data, so
    the natural pairing silently served unsharded), and spatial without
    any mesh must fail loudly."""
    import yaml

    from dgvcc_tpu.cli.main import _build_counter
    from dgvcc_tpu.core.config import load_config

    base = {
        "seed": 1, "version": "clisp", "device": "cpu", "log_para": 1000,
        "patch_size": 1440, "mode": "simple", "num_epochs": 1,
        "checkpoint": None, "serve_shard": "spatial",
        "mesh": {"spatial": 8},
        "model": {"name": "base", "params": {"pretrained": False}},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "scheduler": {"name": "step", "params": {"step_size": 1}},
        "log_dir": str(tmp_path / "logs"),
    }
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(base))
    counter = _build_counter(load_config(str(p)))
    assert counter.shard == "spatial" and counter.n_shards == 8

    base["mesh"] = {}
    p.write_text(yaml.safe_dump(base))
    import pytest

    with pytest.raises(SystemExit, match="spatial"):
        _build_counter(load_config(str(p)))


def test_shard_arg_validated():
    import pytest

    with pytest.raises(ValueError, match="spatial"):
        VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                     mesh=make_mesh(8), shard="bogus")


def test_sharded_artifact_counts_match_single_device(tmp_path):
    """from_artifact(mesh=...): a saved int8 artifact serves
    data-parallel with the qparams replicated once — counts equal the
    single-device artifact path exactly (same int8 program)."""
    from dgvcc_tpu.nn.quant_io import save_quantized

    frames = _frames(8, 96, 128, seed=3)
    built = VideoCounter.from_checkpoint("base", None, dtype=jnp.float32,
                                         quantize=True, calib_frames=frames)
    path = str(tmp_path / "base.i8")
    save_quantized(built.quantized, path, "base")

    single = VideoCounter.from_artifact(path, dtype=jnp.float32)
    sharded = VideoCounter.from_artifact(path, dtype=jnp.float32,
                                         mesh=make_mesh(8))
    c1 = single.count_frames(frames)
    c2 = sharded.count_frames(frames)
    np.testing.assert_allclose(c2, c1, rtol=1e-5, atol=1e-5)
