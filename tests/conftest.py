"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is tested on virtual CPU devices so the suite
runs anywhere and deterministically (the driver validates the real
multi-chip path separately via __graft_entry__.dryrun_multichip).

The environment pins JAX_PLATFORMS=axon (TPU tunnel) and a sitecustomize
pre-imports jax, so the env var alone is not enough — we must also flip
the config knob before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is dominated by CPU compiles
# of full VGG/ResNet training graphs (a cold run is ~25 min on this
# 1-core host). Caching compiled executables across runs cuts warm runs
# to the execution-only time. The cache lives in the repo (gitignored)
# so it survives across sessions.
from dgvcc_tpu.core.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".xla_cache"))


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synth_root_factory(tmp_path_factory):
    """Canonical-layout synthetic crowd dataset builder (img.jpg +
    points.npy + _dmap.npy per sample) for trainer e2e tests — shared
    so the dataset contract lives in ONE place."""

    def make(name, seed=1, splits=(("train", 4), ("val", 2), ("test", 2)),
             hw=(96, 112), pts_per_img=12):
        import numpy as np
        from PIL import Image

        from dgvcc_tpu.ops.dmap import gaussian_density_fixed_np

        root = tmp_path_factory.mktemp(name)
        rng = np.random.default_rng(seed)
        h, w = hw
        for split, n in splits:
            d = root / split
            d.mkdir()
            for k in range(n):
                img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
                Image.fromarray(img).save(d / f"img{k:03d}.jpg")
                pts = rng.uniform(0, [w, h],
                                  (pts_per_img, 2)).astype(np.float32)
                np.save(d / f"img{k:03d}.npy", pts)
                np.save(d / f"img{k:03d}_dmap.npy",
                        gaussian_density_fixed_np((h, w), pts))
        return str(root)

    return make

# ---------------------------------------------------------------------------
# Two-lane suite. Even with the compile cache, the slowest tests are
# TRACING-bound (full VGG/ResNet train graphs traced per test; tracing is
# pure Python and uncacheable, ~10-60 s each on this 1-core host), so the
# full suite cannot fit a short verification window. Default runs
# deselect the heavy lane LOUDLY (a banner + pytest's own deselect
# count); `RUN_HEAVY=1 pytest tests/` or `pytest tests/ --heavy` runs
# everything and remains the pre-commit / per-round gate (see
# BENCH_NOTES.md "Suite cost").
#
# Fast-lane budget: ~5 min warm on a 1-core host (VERDICT r3 item 7).
# Measured 2026-08-19 after the round-4 re-split: 270 tests in
# 6:00 warm (359.8 s; was 320 tests / ~15 min). The residual is the
# long tail (~1.3 s/test genuine trace+execute), not a few hogs — see
# BENCH_NOTES.md "Suite cost". When adding a test, time it
# single-core; >=9 s warm belongs in HEAVY.
# ---------------------------------------------------------------------------

# nodeid substrings of trace-bound tests (everything ≥9 s warm)
HEAVY = (
    # --- round-4 re-split: fast-lane entries that outgrew the budget
    # (durations from a full --durations=70 run, 2026-08-19). Every
    # subsystem keeps a cheap fast-lane sibling: spatial -> mcnn exact
    # step + shard validation; serve_mesh -> test_shard_arg_validated;
    # eval parity -> csrnet/mcnn/bl/regressor_m; sync whitening ->
    # unit tests in test_whitening.py; quant -> site inventory + DG
    # int8 tracks-fp on tiny geometry; e2e -> cli train/test smokes.
    "test_serve_mesh.py::test_spatial_sharded_quantized_artifact",
    "test_spatial.py::test_spatial_step_dg_final_first_step_exact",
    "test_e2e.py::test_early_stop_halts_on_plateau",
    "test_serve_pipeline.py::test_video_counter_quantized_baselines",
    "test_multihost.py::test_host_sharded_batch_drives_parallel_step",
    "test_tb.py::test_scalar_writer_roundtrip",
    "test_serve_mesh.py::test_sharded_tiled_path",
    "test_baselines.py::test_cctrans_padding_mask_limits_leakage",
    "test_models_dg.py::test_batched_two_view_identical_views_match_unbatched",
    "test_reference_ckpt.py::test_cctrans_checkpoint_converts_and_runs",
    "test_quant.py::test_baseline_int8_counts_track_fp[cctrans]",
    "test_serve_mesh.py::test_spatial_tiled_path_pads_indivisible_tile_count",
    "test_serve_mesh.py::test_spatial_sharded_counts_match_single_device",
    "test_spatial.py::test_trainer_spatial_mesh_e2e",
    "test_sync_whitening.py::test_sw_counter_dp_matches_single_device",
    "test_e2e.py::test_bayesian_training_end_to_end",
    "test_quant.py::test_baseline_folded_fp_matches_flax_eval[cctrans]",
    "test_sync_whitening.py::test_isw_dp_matches_single_device",
    "test_reference_ckpt.py::test_pth_drives_trainer_and_serve",
    "test_quant_io.py::test_convnet_artifact_roundtrip[csrnet",
    "test_quant.py::test_baseline_int8_counts_track_fp[bl]",
    "test_baselines.py::test_sasnet_full_res",
    "test_quant.py::test_baseline_int8_counts_track_fp[csrnet]",
    "test_train_steps.py::test_sharded_tiled_counter_matches_single_device",
    "test_serve_mesh.py::test_spatial_whole_frame_pads_height_to_axis",
    "test_serve_mesh.py::test_cli_builds_spatial_mesh_from_config",
    "test_e2e.py::test_test_report_csv",
    "test_serve_mesh.py::test_sharded_counts_match_single_device",
    "test_whitening.py::test_isw_train_step_integration",
    "test_serve_pipeline.py::test_video_counter_tiled_large_frames",
    "test_eval_parity.py::test_sw_counter_eval_parity",
    "test_eval_parity.py::test_dssinet_eval_parity",
    "test_backbone_variants.py::test_densenet_pretrained_into_sw_counter",
    "test_serve_mesh.py::test_sharded_ragged_batch_pads_and_slices",
    "test_eval_parity.py::test_dg_final_eval_parity_reference_module",
    "test_baselines.py::test_dssinet_full_res",
    # second tier (6–10 s each): subsystem keeps a cheaper sibling fast
    "test_serve_fleet.py::test_fleet_startup_failure_stops_replicas",
    "test_pp.py::test_pipeline_matches_sequential[4stage-2deep]",
    "test_serve_mesh.py::test_spatial_sharded_partitions_do_not_gather",
    "test_regressors.py::test_reg_mem_forward_and_train",
    "test_backbone_variants.py::test_ibn_counter_variants_run[kwargs1]",
    "test_tb.py::test_trainer_writes_tb_scalars",
    "test_backbone_variants.py::test_se_resnet_trunk_matches_torch",
    "test_accum.py::test_accum_under_data_parallel_mesh",
    "test_pp.py::test_pipeline_from_real_trunk_stage",
    "test_train_steps.py::test_baseline_train_step_runs_and_learns[bl]",
    "test_reference_ckpt.py::test_sasnet_checkpoint_converts_and_runs",
    "test_torch_export.py::test_family_export_roundtrip[sw]",
    # auto-precision serving: full fp+int8 builds of the 'final' model
    # (~125 s each warm); the fast lane keeps the pure selection-logic
    # test + the artifact-rejection guard
    "test_serve_pipeline.py::test_video_counter_auto_precision_picks_graph_by_batch",
    "test_serve_pipeline.py::test_video_counter_auto_lazy_calibration_waits_for_throughput_batch",
    # --- original heavy lane below
    "test_ab_compare.py::test_ab_lockstep",
    # the big eval-parity oracles (full alt_gvt / vgg16_bn-U graphs in
    # eager flax on this 1-core host; csrnet/mcnn/bl/... stay fast-lane)
    "test_eval_parity.py::test_cctrans_eval_parity",
    "test_eval_parity.py::test_sasnet_eval_parity",
    "test_eval_parity.py::test_sw_vgg_counter_eval_parity",
    "test_quant.py::test_baseline_folded_fp_matches_flax_eval[sasnet]",
    "test_quant.py::test_baseline_folded_fp_matches_flax_eval[bl_bn]",
    "test_quant.py::test_baseline_folded_fp_matches_flax_eval[dssinet]",
    "test_quant.py::test_baseline_int8_counts_track_fp[sasnet]",
    "test_quant.py::test_baseline_int8_counts_track_fp[bl_bn]",
    "test_quant.py::test_baseline_int8_counts_track_fp[dssinet]",
    "test_graft_entry.py::test_dryrun_multichip",
    "test_tp2d.py::test_2d_step_matches_1d_dp",
    "test_tp2d.py::test_2d_eval_forward_matches_single",
    "test_e2e.py::test_base_model_tests_every_epoch",
    "test_e2e.py::test_cli_train_test_end_to_end",
    "test_e2e.py::test_exact_resume_continues_epoch_and_best",
    "test_e2e.py::test_checkpoint_resume_roundtrip",
    "test_e2e.py::test_mesh_config_data_parallel_training",
    "test_e2e.py::test_mesh_config_2d_training",
    "test_e2e.py::test_quantized_test_task",
    "test_e2e.py::test_preemption_graceful_save",
    "test_genjoint.py::test_mode_trains",
    "test_genjoint.py::test_joint_mode_saves_pairs",
    "test_train_steps.py::test_train_step_runs_and_learns",
    "test_train_steps.py::test_parallel_step_dg_model_runs_and_stays_replicated",
    "test_train_steps.py::test_sharded_tile_counting_matches_single_device",
    "test_sync_whitening.py::test_joint_dp_runs_and_stays_replicated",
    "test_models_dg.py::test_remat_gradients_match",
    "test_baselines.py::test_sasnet_non_divisible_size",
    "test_baselines.py::test_cctrans_eighth_res",
    "test_baselines.py::test_cctrans_window_padding",
    "test_serve_pipeline.py::test_cli_serve_task",
    "test_serve_pipeline.py::test_video_counter_quantized_tracks_fp",
    "test_serve_mesh.py::test_sharded_quantized_counts_match_single_device",
    "test_serve_mesh.py::test_sharded_artifact_counts_match_single_device",
    "test_serve_http.py::test_stress_tool_reports_batching",
    "test_serve_http.py::test_cli_serve_http_from_artifact",
    # fleet tests spawn replica subprocesses (fresh JAX compile each)
    "test_serve_fleet.py::test_fleet_round_robin_failover",
    "test_serve_fleet.py::test_fleet_restart_respawns_dead_replica",
    # supervised-launch crash recovery: two subprocess train runs
    "test_e2e.py::test_supervised_launch_recovers_from_crash",
    # true 2-process jax.distributed world (two subprocess JAX inits)
    "test_multihost.py::test_two_process_dp_step",
    # int8 artifact round-trips on the full DG / dssinet graphs
    "test_aot.py::test_aot_quantized_dg_roundtrip",
    "test_quant_io.py::test_dg_artifact_roundtrip",
    "test_quant_io.py::test_convnet_artifact_roundtrip[dssinet",
    "test_quant_io.py::test_convnet_artifact_roundtrip[cctrans",
    "test_quant_io.py::test_video_counter_from_artifact",
    "test_quant_io.py::test_cli_quantize_then_serve_artifact",
    "test_async_ckpt.py::test_trainer_async_save_end_to_end",
    "test_quant.py::test_int8_counts_track_fp",
    "test_whitening.py::test_isw_protocol",
    "test_backbone_variants.py::test_densenet_counters_run",
    "test_torch_io.py::test_vgg19_sw_remap",
    # flax→torch export round-trips: the double converter probe on the
    # big graphs; mcnn/csrnet/bl/sw/ibn stay fast-lane
    "test_torch_export.py::test_dg_final_export_roundtrip",
    "test_torch_export.py::test_dssinet_export_roundtrip",
    "test_torch_export.py::test_family_export_roundtrip[cctrans]",
    "test_torch_export.py::test_family_export_roundtrip[sasnet]",
    "test_torch_export.py::test_family_export_roundtrip[isw]",
    "test_torch_export.py::test_family_export_roundtrip[reg_mem]",
    "test_torch_export.py::test_family_export_roundtrip[sw_vgg]",
    # baseline train-step smokes with full-model traces
    "test_train_steps.py::test_baseline_train_step_runs_and_learns[sasnet]",
    "test_train_steps.py::test_baseline_train_step_runs_and_learns[cctrans]",
    "test_train_steps.py::test_baseline_train_step_runs_and_learns[dssinet]",
    "test_e2e.py::test_cli_export_task_roundtrip",
    "test_e2e.py::test_export_rejects_wrong_family_checkpoint",
    "test_e2e.py::test_nonjoint_single_list_checkpoint_loads",
    "test_e2e.py::test_cli_vis_task",
    "test_genjoint.py::test_generate_task_emits_restyled_images",
)


# Serving legs DELEGATED out of __graft_entry__.dryrun_multichip (see its
# docstring): the dryrun's multi-chip SERVING claims are witnessed by these
# heavy-lane tests instead of dryrun legs, so their existence is a contract.
# pytest_collection_modifyitems asserts each still collects — renaming a
# delegated test fails the suite loudly instead of silently dropping the
# witness (VERDICT r4 item 8).
DELEGATED_SERVING_LEGS = (
    "test_serve_mesh.py::test_sharded_counts_match_single_device",
    "test_serve_mesh.py::test_sharded_ragged_batch_pads_and_slices",
    "test_serve_mesh.py::test_sharded_artifact_counts_match_single_device",
    "test_serve_mesh.py::test_spatial_sharded_counts_match_single_device",
    "test_serve_mesh.py::test_spatial_sharded_partitions_do_not_gather",
    "test_quant_io.py::test_dg_artifact_roundtrip",
)


def pytest_addoption(parser):
    parser.addoption("--heavy", action="store_true", default=False,
                     help="also run the heavy (trace-bound) lane")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "heavy: trace-bound test (full-model jit traces); "
        "deselected by default, run with --heavy or RUN_HEAVY=1")


def pytest_collection_modifyitems(config, items):
    run_heavy = (config.getoption("--heavy")
                 or os.environ.get("RUN_HEAVY", "") not in ("", "0"))
    import pytest as _pytest

    # enforce the dryrun→heavy-lane delegation contract whenever the
    # full suite is collected (a targeted `pytest tests/test_x.py` run
    # can't see the other files, so only check full collections)
    if len({item.path for item in items}) > 3:
        missing = [leg for leg in DELEGATED_SERVING_LEGS
                   if not any(leg in item.nodeid for item in items)]
        if missing:
            raise _pytest.UsageError(
                "delegated multi-chip serving legs missing from the "
                f"suite (renamed? see __graft_entry__.py): {missing}")

    selected, deselected = [], []
    for item in items:
        is_heavy = any(h in item.nodeid for h in HEAVY)
        if is_heavy:
            item.add_marker(_pytest.mark.heavy)
        if is_heavy and not run_heavy:
            deselected.append(item)
        else:
            selected.append(item)
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = selected
        print(f"\n[conftest] fast lane: {len(deselected)} heavy "
              f"(trace-bound) tests DESELECTED — run them with "
              f"'RUN_HEAVY=1 pytest tests/' or 'pytest tests/ --heavy'")
