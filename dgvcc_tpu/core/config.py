"""YAML experiment configs.

Schema-compatible with the reference's configs (see
/root/reference/configs/sta_final.yml and /root/reference/main.py:104-140):
top-level keys ``seed, version, device, log_para, patch_size, mode,
num_epochs, checkpoint, model, {train,val,test}_dataset,
{train,val,test}_loader, loss, optimizer, scheduler``. YAML anchors work
as-is (plain yaml.safe_load).

TPU-specific extensions (all optional, defaulted):
    compute_dtype: 'bfloat16' | 'float32'   — activation dtype
    mesh:          {data: N[, model: M]}     — device mesh axis sizes;
                   model>1 shards the DG memory bank over the model axis
                   (composed 2-D data x tensor parallelism)
    donate:        bool                      — donate train-state buffers
    test_quantized: bool                     — run the test task through
                   the int8 PTQ serving graph (DG family; nn/quant.py)
    accum_steps:   int                       — gradient accumulation: average
                   grads over k micro-batch steps, one optimizer update
                   (optax.MultiSteps; effective batch k×batch_size)
    compile_cache: bool | path               — persist XLA compilations
                   across process restarts (core/cache.py; default
                   repo-local .xla_cache when `true`)
    async_save:    bool                      — defer checkpoint readback +
                   disk writes to a background thread (snapshot-on-device
                   keeps them exact under buffer donation; flushed at
                   train/test end and on preemption)
    early_stop:    int                       — stop training after N
                   consecutive epochs without val-criterion improvement
                   (0/absent = run every configured epoch, like the
                   reference); resume-aware (best epoch restores from
                   the checkpoint extra)
    test_report:   bool | path               — per-image CSV from the
                   test task (name, gt, pred, abs_err; worst-first)
                   at {log_dir}/test_report.csv or the given path
    ema:           float in (0, 1)           — Polyak/EMA shadow weights,
                   decay per OPTIMIZER UPDATE (under accum_steps the
                   per-micro-step decay is ema^(1/k), which composes to
                   exactly ema per applied update — the averaging
                   horizon is independent of accumulation).
                   validate/test/vis/export and `--task serve` on the
                   checkpoint all use the averaged weights; checkpoints
                   carry them (`ema_params`), and resuming a pre-EMA
                   checkpoint seeds the shadow from its params
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import yaml


@dataclasses.dataclass
class Config:
    seed: int = 0
    version: str = "debug"
    device: str = "tpu"
    log_para: float = 1000.0
    patch_size: int = 1440
    mode: str = "simple"
    num_epochs: int = 100
    checkpoint: Optional[Any] = None  # path or [gen_path, reg_path]
    model: Dict[str, Any] = dataclasses.field(default_factory=dict)
    loss: Dict[str, Any] = dataclasses.field(default_factory=dict)
    train_dataset: Optional[Dict[str, Any]] = None
    val_dataset: Optional[Dict[str, Any]] = None
    test_dataset: Optional[Dict[str, Any]] = None
    train_loader: Dict[str, Any] = dataclasses.field(default_factory=dict)
    val_loader: Dict[str, Any] = dataclasses.field(default_factory=dict)
    test_loader: Dict[str, Any] = dataclasses.field(default_factory=dict)
    optimizer: Dict[str, Any] = dataclasses.field(default_factory=dict)
    scheduler: Optional[Dict[str, Any]] = None
    # TPU-native extensions
    compute_dtype: str = "bfloat16"
    mesh: Dict[str, int] = dataclasses.field(default_factory=dict)
    donate: bool = True
    log_dir: str = "logs"
    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        extra = {k: v for k, v in d.items() if k not in known}
        cfg = cls(**kwargs)
        cfg.extra.update(extra)
        return cfg

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d.update(d.pop("extra"))
        return d


def load_config(path: str) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f)
    return Config.from_dict(raw)


def dump_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)
