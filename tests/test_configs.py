"""Config zoo sanity: every shipped YAML parses and its model/loss/
optimizer/scheduler build (datasets need real data roots, skipped)."""

import os
from glob import glob

import pytest

from dgvcc_tpu.core.config import load_config
from dgvcc_tpu.core.registry import LOSSES, MODELS
from dgvcc_tpu.train.optim import build_optimizer, build_scheduler
import dgvcc_tpu.models  # noqa: F401
import dgvcc_tpu.losses  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    glob(os.path.join(REPO, "configs", "**", "*.yml"), recursive=True)
)


def test_config_zoo_nonempty():
    assert len(CONFIGS) >= 50


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: os.path.relpath(p, REPO))
def test_config_builds(path):
    cfg = load_config(path)
    assert cfg.version
    assert cfg.mode in ("simple", "base", "add", "cls", "final", "isw",
                        "regression", "generation", "joint", "discrimination")
    model = MODELS.build(cfg.model["name"], **{
        k: v for k, v in cfg.model.get("params", {}).items()})
    assert model is not None
    loss = LOSSES.build(cfg.loss["name"], **cfg.loss.get("params", {}))
    assert loss is not None
    tx = build_optimizer(cfg.optimizer)
    base_lr = cfg.optimizer.get("params", {}).get("lr", 1e-3)
    sch = build_scheduler(cfg.scheduler, base_lr)
    if sch is not None:
        assert sch.current_lr > 0
