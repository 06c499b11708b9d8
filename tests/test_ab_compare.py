"""scripts/ab_compare.py harness: the two frameworks must stay in
lockstep (identical init + identical batches) — per-epoch losses agree
to ~1e-4 relative and val MAE to ~1e-2 absolute."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.heavy
def test_ab_lockstep_mcnn():
    import ab_compare

    rows = ab_compare.ab_run("mcnn", epochs=2, lr=1e-4, seed=3)
    assert len(rows) == 2
    for epoch, tl, jl, tmae, jmae in rows:
        assert abs(tl - jl) / max(abs(tl), 1e-6) < 1e-3, (epoch, tl, jl)
        assert abs(tmae - jmae) < 0.05, (epoch, tmae, jmae)


@pytest.mark.heavy
def test_ab_lockstep_dg_base_sgd():
    """The flagship DG family with train-mode BatchNorm: under SGD the
    two frameworks stay numerically lockstep (Adam amplifies float
    noise through gradient-sign flips — see ab_run docstring)."""
    import ab_compare

    rows = ab_compare.ab_run("dg_base", epochs=1, lr=1e-4, seed=3,
                             optimizer="sgd")
    (epoch, tl, jl, tmae, jmae), = rows
    assert abs(tl - jl) / max(abs(tl), 1e-6) < 2e-3, (tl, jl)
    assert abs(tmae - jmae) < 0.05, (tmae, jmae)


@pytest.mark.heavy
def test_ab_lockstep_ibn_sgd():
    """The whitening family's train-mode arm: the IBN-b counter
    (affine InstanceNorms + train-mode BatchNorms through a ResNet-50
    trunk) stays numerically lockstep with the actual reference module
    under SGD — extends the A/B evidence from eval-parity to training
    for the whitening counters."""
    import ab_compare

    rows = ab_compare.ab_run("ibn", epochs=1, lr=1e-4, seed=3,
                             optimizer="sgd")
    (epoch, tl, jl, tmae, jmae), = rows
    assert abs(tl - jl) / max(abs(tl), 1e-6) < 2e-3, (tl, jl)
    assert abs(tmae - jmae) < 0.05, (tmae, jmae)


@pytest.mark.heavy
def test_ab_lockstep_sw_sgd():
    """SwitchWhiten counter: train-mode Newton–Schulz whitening
    (importance-weighted batch/instance stats, running-stat momentum)
    stays lockstep with the actual reference module through training —
    gradient-level evidence for the most TPU-idiosyncratic compute in
    the project."""
    import ab_compare

    rows = ab_compare.ab_run("sw", epochs=1, lr=1e-4, seed=3,
                             optimizer="sgd")
    (epoch, tl, jl, tmae, jmae), = rows
    assert abs(tl - jl) / max(abs(tl), 1e-6) < 2e-3, (tl, jl)
    assert abs(tmae - jmae) < 0.05, (tmae, jmae)
