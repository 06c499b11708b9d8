"""dgvcc_tpu — TPU-native domain-generalized crowd counting framework.

A from-scratch JAX / Flax / Pallas re-design of the capabilities of the
DGVCC reference (Shimmer93/DGVCC): config-driven train/test/vis of
density-map regression models with domain-generalization training modes.

Layout:
    core/      config loading (reference YAML schema), registries, logging
    utils/     geometry helpers, meters, seeding
    ops/       density-map generation (numpy reference + Pallas kernel),
               tiled arbitrary-size inference
    nn/        flax building blocks: ConvBlock, VGG/ResNet encoders,
               whitening layers, torch-weight conversion
    models/    DG family, whitening baselines (SW/IBN/ISW), classic baselines
    losses/    count MSE, Bayesian loss, ortho/sim/lw/triplet/JSD
    data/      offline preprocessing + density generation, online datasets
    parallel/  mesh construction, shard_map data-parallel train steps
    train/     trainer loops, per-mode jitted steps, checkpointing
    cli/       `python -m dgvcc_tpu.cli.main --config ... --task ...`
"""

__version__ = "0.4.0"  # kept in sync with pyproject.toml (test_packaging)
