"""LR scheduler parity vs torch.optim.lr_scheduler goldens (epoch-stepped
like the reference, trainers/trainer.py:82-87)."""

import numpy as np
import torch

from dgvcc_tpu.train.optim import build_scheduler


def torch_lrs(sched_factory, epochs, metric_fn=None):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    sch = sched_factory(opt)
    lrs = []
    for e in range(epochs):
        lrs.append(opt.param_groups[0]["lr"])
        if metric_fn is not None:
            sch.step(metric_fn(e))
        else:
            sch.step()
    return lrs


def ours_lrs(spec, base_lr, epochs, metric_fn=None):
    sch = build_scheduler(spec, base_lr)
    lrs = []
    for e in range(epochs):
        lrs.append(sch.current_lr)
        sch.step(metric_fn(e) if metric_fn else None)
    return lrs


def test_step_lr():
    golden = torch_lrs(lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=3, gamma=0.5), 10)
    ours = ours_lrs({"name": "step", "params": {"step_size": 3, "gamma": 0.5}}, 0.1, 10)
    np.testing.assert_allclose(ours, golden, rtol=1e-6)


def test_multistep_lr():
    golden = torch_lrs(lambda o: torch.optim.lr_scheduler.MultiStepLR(o, milestones=[2, 5, 9], gamma=0.1), 12)
    ours = ours_lrs({"name": "multistep", "params": {"milestones": [2, 5, 9], "gamma": 0.1}}, 0.1, 12)
    np.testing.assert_allclose(ours, golden, rtol=1e-6)


def test_cosine_lr():
    golden = torch_lrs(lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(o, T_max=10, eta_min=1e-4), 10)
    ours = ours_lrs({"name": "cosine", "params": {"T_max": 10, "eta_min": 1e-4}}, 0.1, 10)
    np.testing.assert_allclose(ours, golden, rtol=1e-5)


def test_onecycle_lr_epoch_stepped():
    """The reference steps OneCycleLR once per epoch — only the first
    num_epochs points of the curve are visited (optim.py docstring)."""
    # max_lr deliberately != base_lr so a max_lr/base_lr mixup fails
    def factory(o):
        return torch.optim.lr_scheduler.OneCycleLR(
            o, max_lr=0.25, epochs=150, steps_per_epoch=15,
            final_div_factor=1000)
    golden = torch_lrs(factory, 150)
    ours = ours_lrs({"name": "onecycle", "params": {
        "max_lr": 0.25, "epochs": 150, "steps_per_epoch": 15,
        "final_div_factor": 1000}}, 0.1, 150)
    np.testing.assert_allclose(ours, golden, rtol=1e-4)


def test_plateau_lr():
    metrics = [10.0, 9.0, 9.0, 9.0, 9.0, 9.0, 8.0, 8.0, 8.0, 8.0, 8.0, 8.0, 8.0]

    def factory(o):
        return torch.optim.lr_scheduler.ReduceLROnPlateau(
            o, factor=0.5, patience=2)
    golden = torch_lrs(factory, len(metrics), metric_fn=lambda e: metrics[e])
    ours = ours_lrs({"name": "plateau", "params": {"factor": 0.5, "patience": 2}},
                    0.1, len(metrics), metric_fn=lambda e: metrics[e])
    np.testing.assert_allclose(ours, golden, rtol=1e-6)
