"""Checkpointing.

Keeps the reference's artifact contract (trainers/trainer.py:106-115:
rolling ``last``, rolling ``best_{epoch}_{criterion:.4f}``, plus the
threshold-gated ``test_{mae}``) but saves the FULL training state —
params, batch stats, optimizer moments, epoch/step counters — so resume
is exact (the reference saves model weights only and cannot resume the
optimizer). Format: single-file msgpack (flax.serialization), portable
and dependency-free.

Loading is non-strict like the reference (load_state_dict(strict=False),
trainer.py:41-44): matching subtrees are restored, mismatches warn.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization
from flax.core import unfreeze


def _to_state_dict(state, extra: Optional[Dict] = None) -> Dict[str, Any]:
    d = {
        "params": unfreeze(state.params),
        "batch_stats": unfreeze(state.batch_stats),
        "opt_state": serialization.to_state_dict(state.opt_state),
        "step": np.asarray(state.step),
    }
    if extra:
        d["extra"] = extra
    return d


def save_checkpoint(path: str, state, extra: Optional[Dict] = None) -> None:
    payload = serialization.msgpack_serialize(
        jax.tree.map(np.asarray, _to_state_dict(state, extra))
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def _merge_nonstrict(target, loaded, path="", warnings=None):
    """Copy leaves from loaded into target where the structure matches."""
    if isinstance(target, dict) and isinstance(loaded, dict):
        out = {}
        for k, v in target.items():
            if k in loaded:
                out[k] = _merge_nonstrict(v, loaded[k], f"{path}/{k}", warnings)
            else:
                if warnings is not None:
                    warnings.append(f"missing in checkpoint: {path}/{k}")
                out[k] = v
        return out
    t = np.asarray(target)
    l = np.asarray(loaded)
    if t.shape != l.shape:
        if warnings is not None:
            warnings.append(f"shape mismatch at {path}: ckpt {l.shape} vs model {t.shape}")
        return target
    return l.astype(t.dtype)


def load_checkpoint(path: str, state, strict: bool = False):
    """Restore a checkpoint into ``state``. Returns (state, extra, warnings)."""
    with open(path, "rb") as f:
        loaded = serialization.msgpack_restore(f.read())
    warnings: list = []
    params = _merge_nonstrict(unfreeze(state.params), loaded.get("params", {}),
                              "params", warnings)
    bs = _merge_nonstrict(unfreeze(state.batch_stats), loaded.get("batch_stats", {}),
                          "batch_stats", warnings)
    new_state = state.replace(params=params, batch_stats=bs)
    if "opt_state" in loaded:
        try:
            opt_state = serialization.from_state_dict(state.opt_state, loaded["opt_state"])
            new_state = new_state.replace(opt_state=opt_state)
        except Exception as e:  # optimizer changed — weights-only restore
            warnings.append(f"opt_state not restored: {e}")
    if "step" in loaded:
        new_state = new_state.replace(step=np.asarray(loaded["step"]))
    if strict:
        # strict about WEIGHTS (missing/unexpected/shape-mismatched
        # params or batch_stats); an optimizer-state mismatch only means
        # the optimizer config changed and stays a warning
        fatal = [w for w in warnings if not w.startswith("opt_state")]
        if fatal:
            raise ValueError("strict load failed:\n" + "\n".join(fatal))
    return new_state, loaded.get("extra", {}), warnings


class CheckpointRotator:
    """Implements the reference's rolling last/best files
    (trainer.py:106-115) under a log dir."""

    def __init__(self, log_dir: str, suffix: str = ".ckpt"):
        self.log_dir = log_dir
        self.suffix = suffix

    def save_last(self, state, extra=None):
        for old in glob(os.path.join(self.log_dir, "last*" + self.suffix)):
            os.remove(old)
        save_checkpoint(os.path.join(self.log_dir, "last" + self.suffix), state, extra)

    def save_best(self, state, epoch: int, criterion: float, extra=None):
        for old in glob(os.path.join(self.log_dir, "best*" + self.suffix)):
            os.remove(old)
        path = os.path.join(self.log_dir, f"best_{epoch}_{criterion:.4f}" + self.suffix)
        save_checkpoint(path, state, extra)

    def save_test(self, state, mae: float, extra=None):
        path = os.path.join(self.log_dir, f"test_{mae}" + self.suffix)
        save_checkpoint(path, state, extra)

    def save_last_pair(self, gen_state, reg_state, extra=None):
        """Rolling last for (gen, reg) pairs — *_gen/*_reg naming parity
        with the reference (dgtrainer.py:43-48)."""
        for old in glob(os.path.join(self.log_dir, "last*" + self.suffix)):
            os.remove(old)
        save_checkpoint(os.path.join(self.log_dir, "last_gen" + self.suffix),
                        gen_state, extra)
        save_checkpoint(os.path.join(self.log_dir, "last_reg" + self.suffix),
                        reg_state, extra)

    def save_best_pair(self, gen_state, reg_state, epoch, criterion, extra=None):
        for old in glob(os.path.join(self.log_dir, "best*" + self.suffix)):
            os.remove(old)
        stem = os.path.join(self.log_dir, f"best_{epoch}_{criterion:.4f}")
        save_checkpoint(stem + "_gen" + self.suffix, gen_state, extra)
        save_checkpoint(stem + "_reg" + self.suffix, reg_state, extra)

    def latest(self) -> Optional[str]:
        cands = glob(os.path.join(self.log_dir, "last" + self.suffix))
        return cands[0] if cands else None
