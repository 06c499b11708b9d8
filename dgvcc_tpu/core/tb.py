"""Optional TensorBoard scalar logging (config key ``tensorboard: true``).

The reference tracks experiments only through ``log.txt`` lines
(/root/reference/trainers/trainer.py:32-39); this is the additive
experiment-tracking nicety planned in SURVEY §5 ("same file contract +
optional TB"). Per-epoch train-loss components, validation
criterion/extras, learning rate and epoch wall time land as TB scalars
under ``{log_dir}/{version}/tb/``.

Design constraints:
  * zero new hard dependency — ``torch.utils.tensorboard`` imports
    lazily on first use, only when enabled (torch ships in the image;
    the event-file writer is pure Python + protobuf);
  * zero cost when disabled — every method is a no-op, and the trainer
    guards its metric ``device_get`` behind ``enabled`` so no extra
    host readbacks happen on the hot path;
  * never kills a run — an import or write failure logs one warning
    and disables the writer.
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional


class ScalarWriter:
    """TB scalar writer; inert unless ``enabled`` and torch TB imports."""

    def __init__(self, logdir: str, enabled: bool = False,
                 warn: Optional[Callable[[str], None]] = None):
        self.logdir = logdir
        self.enabled = bool(enabled)
        self._warn = warn or (lambda msg: print(msg, flush=True))
        self._writer = None

    def _get(self):
        if self._writer is None:
            # construction included: an unwritable logdir (SummaryWriter
            # mkdirs it) must disable logging, not kill the run
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(log_dir=self.logdir)
            except Exception as e:
                self._warn(f"[tb] tensorboard disabled ({e})")
                self.enabled = False
                return None
        return self._writer

    def scalar(self, tag: str, value, step: int):
        if not self.enabled:
            return
        w = self._get()
        if w is None:
            return
        try:
            w.add_scalar(tag, float(value), int(step))
        except Exception as e:
            self._warn(f"[tb] write failed, disabling ({e})")
            self.enabled = False

    def scalars(self, values: Mapping[str, float], step: int,
                prefix: str = ""):
        for k, v in values.items():
            self.scalar(prefix + k, v, step)

    def flush(self):
        # guarded: flush runs right after a write may have disabled the
        # writer, and close runs in trainer finally-blocks where a raise
        # would mask the real exception (e.g. the NaN-guard diagnostic)
        if self._writer is not None:
            try:
                self._writer.flush()
            except Exception as e:
                self._warn(f"[tb] flush failed, disabling ({e})")
                self.enabled = False

    def close(self):
        if self._writer is not None:
            try:
                self._writer.close()
            except Exception as e:
                self._warn(f"[tb] close failed ({e})")
            self._writer = None
