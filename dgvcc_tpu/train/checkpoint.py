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
    if getattr(state, "ema_params", None) is not None:
        d["ema_params"] = unfreeze(state.ema_params)
    if extra:
        d["extra"] = extra
    return d


def _write_payload(path: str, sd: Dict[str, Any]) -> None:
    payload = serialization.msgpack_serialize(jax.tree.map(np.asarray, sd))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def _write_pair(path_a: str, sd_a: Dict[str, Any],
                path_b: str, sd_b: Dict[str, Any]) -> None:
    """Near-atomic two-file write: BOTH payloads are fully staged to
    .tmp files before either rename, so a crash anywhere during the
    (seconds-long) serialization leaves the previous complete pair
    untouched — the mixed-pair window shrinks to the gap between two
    rename syscalls."""
    for p, sd in ((path_a, sd_a), (path_b, sd_b)):
        payload = serialization.msgpack_serialize(
            jax.tree.map(np.asarray, sd))
        with open(p + ".tmp", "wb") as f:
            f.write(payload)
    os.replace(path_a + ".tmp", path_a)
    os.replace(path_b + ".tmp", path_b)


def save_checkpoint(path: str, state, extra: Optional[Dict] = None) -> None:
    _write_payload(path, _to_state_dict(state, extra))


# -- async writing -----------------------------------------------------------

# One jitted copy for ALL pytrees (jit caches per input structure): a
# single dispatch that returns FRESH device buffers. Required before a
# deferred save — the train step donates the current state's buffers
# (donate_argnums), so by the time a background thread reads them back
# they'd be invalidated; copies are untouched by donation.
_COPY = None


def snapshot_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Copy every jax.Array leaf to a fresh device buffer (one jitted
    dispatch); non-array leaves (python scalars, strings in ``extra``)
    pass through untouched."""
    global _COPY
    if _COPY is None:
        import jax.numpy as jnp

        _COPY = jax.jit(lambda leaves: [jnp.copy(a) for a in leaves])
    leaves, treedef = jax.tree.flatten(sd)
    idx = [i for i, l in enumerate(leaves) if isinstance(l, jax.Array)]
    if idx:
        copied = _COPY([leaves[i] for i in idx])
        for i, c in zip(idx, copied):
            leaves[i] = c
    return jax.tree.unflatten(treedef, leaves)


class AsyncWriter:
    """Single background checkpoint writer.

    Jobs (rotation + device→host readback + msgpack + atomic write) run
    in submission order on one daemon thread, so the epoch loop only
    pays for the on-device snapshot (one dispatch) instead of the full
    readback + disk write. ``flush()`` blocks until the queue drains and
    re-raises the first failure — call it before process exit and before
    reading back a file this writer may still be writing.
    """

    def __init__(self):
        import atexit
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue()
        self._err: Optional[BaseException] = None
        self._t = threading.Thread(target=self._loop, daemon=True)
        self._t.start()
        # belt-and-suspenders: the writer is a daemon thread, so an
        # unwinding process would otherwise kill it mid-queue; atexit
        # runs before daemon threads are reaped
        atexit.register(self.flush)

    def _loop(self):
        while True:
            job = self._q.get()
            if job is None:
                self._q.task_done()
                return
            try:
                job()
            except BaseException as e:  # surfaced at flush/submit
                self._err = self._err or e
            finally:
                self._q.task_done()

    def submit(self, job) -> None:
        if self._err is not None:
            self.flush()  # raises
        self._q.put(job)

    def flush(self) -> None:
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint write failed") from err

    def close(self) -> None:
        self.flush()
        self._q.put(None)
        self._t.join()


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
    if getattr(state, "ema_params", None) is not None:
        if "ema_params" in loaded:
            ema = _merge_nonstrict(unfreeze(state.ema_params),
                                   loaded["ema_params"], "ema_params",
                                   warnings)
        else:
            # checkpoint predates EMA (or was trained with it off):
            # seed the shadow weights from the restored params so the
            # average starts at the resumed model, not at random init
            # (copied — aliased buffers would be donated twice by the
            # donated train step)
            ema = jax.tree.map(np.copy, new_state.params)
            warnings.append("ema_params: seeded from the checkpoint's "
                            "params (none saved)")
        new_state = new_state.replace(ema_params=ema)
    elif "ema_params" in loaded:
        warnings.append("ema_params: present in the checkpoint but ema "
                        "is off for this run — ignored (set `ema:` in "
                        "the config to evaluate them)")
    if strict:
        # strict about WEIGHTS (missing/unexpected/shape-mismatched
        # params or batch_stats); an optimizer-state mismatch only means
        # the optimizer config changed and stays a warning. EMA shadows
        # are derived state: seeding/ignoring them is not corruption
        fatal = [w for w in warnings
                 if not w.startswith(("opt_state", "ema_params"))]
        if fatal:
            raise ValueError("strict load failed:\n" + "\n".join(fatal))
    return new_state, loaded.get("extra", {}), warnings


class CheckpointRotator:
    """Implements the reference's rolling last/best files
    (trainer.py:106-115) under a log dir."""

    def __init__(self, log_dir: str, suffix: str = ".ckpt",
                 writer: Optional[AsyncWriter] = None):
        self.log_dir = log_dir
        self.suffix = suffix
        self.writer = writer  # None → synchronous saves (the default)

    def _purge(self, pattern: str, keep=frozenset()):
        for old in glob(os.path.join(self.log_dir, pattern + self.suffix)):
            if old not in keep:
                os.remove(old)

    def _save(self, fname: str, state, extra, purge: Optional[str] = None,
              keep=()):
        """One save; the rotation purge (``purge`` glob stem, minus
        ``keep`` stems and the file just written) runs AFTER the write —
        purge-first would open a crash window where the previous rolling
        checkpoint is already deleted and the new one not yet written,
        which for the *_gen/*_reg pairs means a SIGKILL there loses the
        only resumable state (the single-file case is safe regardless:
        os.replace overwrites atomically). A crash between write and
        purge merely leaves a stale extra file. Sync mode writes inline;
        async mode snapshots the device state NOW (one jitted copy —
        immune to the next step's buffer donation) and defers
        readback+write+purge to the writer thread, in order."""
        path = os.path.join(self.log_dir, fname + self.suffix)
        keep = {os.path.join(self.log_dir, k + self.suffix)
                for k in keep} | {path}
        if self.writer is None:
            save_checkpoint(path, state, extra)
            if purge:
                self._purge(purge, keep)
            return
        sd = snapshot_state_dict(_to_state_dict(state, extra))

        def job():
            _write_payload(path, sd)
            if purge:
                self._purge(purge, keep)

        self.writer.submit(job)

    def flush(self):
        """Block until every deferred save has hit disk (no-op sync)."""
        if self.writer is not None:
            self.writer.flush()

    def save_last(self, state, extra=None):
        self._save("last", state, extra, purge="last*")

    def save_best(self, state, epoch: int, criterion: float, extra=None):
        self._save(f"best_{epoch}_{criterion:.4f}", state, extra,
                   purge="best*")

    def save_test(self, state, mae: float, extra=None):
        self._save(f"test_{mae}", state, extra)

    def _save_pair(self, fname_g: str, fname_r: str, gen_state, reg_state,
                   extra, purge: str):
        """Paired save through :func:`_write_pair` (both payloads staged
        before either rename — a crash mid-save leaves the previous
        complete pair, never a mixed-epoch gen/reg), then the rotation
        purge."""
        pg = os.path.join(self.log_dir, fname_g + self.suffix)
        pr = os.path.join(self.log_dir, fname_r + self.suffix)
        keep = {pg, pr}
        if self.writer is None:
            _write_pair(pg, _to_state_dict(gen_state, extra),
                        pr, _to_state_dict(reg_state, extra))
            self._purge(purge, keep)
            return
        sd_g = snapshot_state_dict(_to_state_dict(gen_state, extra))
        sd_r = snapshot_state_dict(_to_state_dict(reg_state, extra))

        def job():
            _write_pair(pg, sd_g, pr, sd_r)
            self._purge(purge, keep)

        self.writer.submit(job)

    def save_last_pair(self, gen_state, reg_state, extra=None):
        """Rolling last for (gen, reg) pairs — *_gen/*_reg naming parity
        with the reference (dgtrainer.py:43-48)."""
        self._save_pair("last_gen", "last_reg", gen_state, reg_state,
                        extra, purge="last*")

    def save_best_pair(self, gen_state, reg_state, epoch, criterion, extra=None):
        stem = f"best_{epoch}_{criterion:.4f}"
        self._save_pair(stem + "_gen", stem + "_reg", gen_state, reg_state,
                        extra, purge="best*")

    def latest(self) -> Optional[str]:
        cands = glob(os.path.join(self.log_dir, "last" + self.suffix))
        return cands[0] if cands else None
