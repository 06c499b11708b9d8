"""Per-chip process pinning.

One helper shared by every multi-process launcher (scripts/launch.py
experiment fan-out, serve_fleet.py replica fleet): restrict a child
process to one chip (or a chip subset) — the TPU equivalent of the
reference's ``CUDA_VISIBLE_DEVICES=N`` in train*.sh
(/root/reference/train.sh:8-10).
"""

from __future__ import annotations

import os
from typing import Optional


def chip_env(device: Optional[str]) -> dict:
    """Child-process env pinning it to ``device`` (None = inherit all).

    TPU processes claim every local chip by default; TPU_VISIBLE_CHIPS +
    single-process TPU_PROCESS_BOUNDS restrict the claim.
    CUDA_VISIBLE_DEVICES is set too — harmless on TPU, covers GPU hosts.
    """
    env = dict(os.environ)
    if device is not None:
        env["TPU_VISIBLE_CHIPS"] = str(device)
        env["TPU_PROCESS_BOUNDS"] = "1,1,1"
        env["CUDA_VISIBLE_DEVICES"] = str(device)
    return env
