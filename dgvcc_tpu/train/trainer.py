"""Experiment trainer.

Drives the jitted per-mode train steps (train/steps.py) with the
reference's experiment protocol (/root/reference/trainers/trainer.py:20,
trainers/dgtrainer.py:27): epoch loop → per-epoch scheduler step →
per-image validation (MAE criterion, MSE extra) → rolling last/best
checkpoints; test with the hard-coded re-save thresholds; matplotlib
visualization dumps; train_and_test that tests only when val improves.

TPU-native differences:
  * the train step is ONE compiled program per mode (no per-batch
    Python dispatch or host sync except the scalar loss readback);
  * validation counts via bucketed static-shape tiling (ops/tiling.py);
  * checkpoints carry optimizer state and epoch, so resume is exact;
  * optional data-parallel mesh: batches shard over devices, grads and
    batch stats sync via collectives (parallel/mesh.py).
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dgvcc_tpu.core.config import Config
from dgvcc_tpu.core.logging import RunLogger
from dgvcc_tpu.core.tb import ScalarWriter
from dgvcc_tpu.core.registry import DATASETS, LOSSES, MODELS
from dgvcc_tpu.data.loader import build_loader
from dgvcc_tpu.ops.tiling import TiledCounter
from dgvcc_tpu.train.checkpoint import (AsyncWriter, CheckpointRotator,
                                        load_checkpoint)
from dgvcc_tpu.train.optim import build_optimizer, build_scheduler
from dgvcc_tpu.train.state import create_train_state
from dgvcc_tpu.train.steps import build_train_step, jit_train_step
from dgvcc_tpu.utils.misc import (AverageMeter, DictAvgMeter,
                                  get_current_datetime, progress,
                                  seed_everything)


# models the reference drives through main_base.py / BaseTrainer
# (main_base.py:36-52) — they inherit its protocol quirks: test after
# every epoch AND predict-tiling hard-coded at 800 px regardless of the
# config patch_size (basetrainer.py:51-66)
_BASETRAINER_MODELS = frozenset({"csrnet", "mcnn", "sasnet", "dssinet",
                                 "cctrans", "bl", "dgnet", "dgnet_cls"})


class DGTrainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        seed_everything(cfg.seed)
        self.log_dir = os.path.join(cfg.log_dir, cfg.version)
        self.logger = RunLogger(self.log_dir)
        # `async_save: true` defers checkpoint readback + disk writes to
        # a background thread (the epoch loop pays one on-device buffer
        # copy instead); flushed at train/test end and on preemption
        self.ckpt_writer = (AsyncWriter()
                            if cfg.extra.get("async_save") else None)
        self.rotator = CheckpointRotator(self.log_dir,
                                         writer=self.ckpt_writer)
        # `tensorboard: true` adds TB scalars (loss components, val
        # criterion, lr, epoch time) under {log_dir}/tb — additive to
        # the reference's log.txt contract, no-op (and no extra host
        # readbacks) when off
        self.tb = ScalarWriter(os.path.join(self.log_dir, "tb"),
                               enabled=bool(cfg.extra.get("tensorboard")),
                               warn=self.log)
        self.mode = cfg.mode
        self.log_para = float(cfg.log_para)
        self.patch_size = cfg.patch_size
        self.joint = False
        self._built = False

    # ---- construction ----------------------------------------------------

    def log(self, msg, **kw):
        self.logger.log(msg, **kw)

    def _progress(self, iterable, description: str):
        """Per-batch progress line (easy_track parity, reference
        trainers/trainer.py:80,94,145,174). TTY-only by default; config
        extra ``progress: true/false`` forces it on/off."""
        return progress(iterable, description,
                        enabled=self.cfg.extra.get("progress"))

    def build(self):
        if self._built:
            return
        cfg = self.cfg
        import dgvcc_tpu.models  # noqa: F401
        import dgvcc_tpu.losses  # noqa: F401
        import dgvcc_tpu.data  # noqa: F401

        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        # data-parallel mesh: config `mesh: {data: N}` shards batches over
        # N devices. Decided BEFORE model construction so whitening/BN
        # layers can be built with the mesh axis name — SwitchWhiten and
        # BatchNorm then pmean their batch mean/cov across shards in the
        # training forward, the jax-collective equivalent of the
        # reference's SyncSwitchWhiten/SyncBatchNorm all_reduce
        # (models/ISW/sync_switchwhiten.py:12-56, ISW/config.py:135).
        dp = int((cfg.mesh or {}).get("data", 1))
        mp = int((cfg.mesh or {}).get("model", 1))
        sp = int((cfg.mesh or {}).get("spatial", 1))
        self.dp_mesh = None
        self.mesh2d = None
        self.sp_mesh = None
        if sp > 1:
            # `mesh: {spatial: N}`: crop HEIGHT shards over the mesh via
            # GSPMD (parallel/spatial.py) — per-chip activation memory
            # drops ~N×, numerics stay single-device-exact (global-view
            # stats). For crops that fit one chip prefer data DP (no
            # halo traffic), so composition is deliberately rejected.
            if dp > 1 or mp > 1:
                raise ValueError("mesh: {spatial: N} does not compose "
                                 "with data/model axes — spatial is for "
                                 "samples too large for one chip")
            if jax.process_count() > 1:
                raise ValueError("mesh spatial-axis sharding is single-"
                                 "process for now")
            if self.mode == "joint":
                raise ValueError("mesh: {spatial: N} is not supported "
                                 "for joint mode")
            from dgvcc_tpu.parallel.spatial import make_spatial_mesh

            self.sp_mesh = make_spatial_mesh(sp)
        if mp > 1:
            # composed data × tensor parallelism: `mesh: {data: N, model: M}`
            # — batches shard over 'data', the DG memory bank (and its
            # optimizer moments) shard over 'model'
            # (parallel/mesh.py::build_parallel_train_step_2d)
            if jax.process_count() > 1:
                raise ValueError("mesh model-axis sharding is single-"
                                 "process for now (pod runs use data only)")
            if self.mode == "joint":
                raise ValueError("mesh: {model: M} is not supported for "
                                 "joint mode")
            from dgvcc_tpu.parallel.mesh import make_mesh_2d

            self.mesh2d = make_mesh_2d(dp, mp)
        elif dp > 1:
            if jax.process_count() > 1:
                # pod: the mesh spans every process's chips; batches are
                # assembled from per-host loader slices (multihost.py)
                from dgvcc_tpu.parallel.multihost import global_mesh

                self.dp_mesh = global_mesh(dp)
            else:
                from dgvcc_tpu.parallel import make_mesh

                self.dp_mesh = make_mesh(dp)

        model_params = dict(cfg.model.get("params", {}))
        if dp > 1:
            from dgvcc_tpu.parallel.mesh import DATA_AXIS

            target = MODELS.get(cfg.model["name"])
            if "axis_name" in getattr(target, "__dataclass_fields__", {}):
                model_params.setdefault("axis_name", DATA_AXIS)
        # tp_axis is trainer-managed (the TP twin below); a user value
        # would crash init with an unbound-axis error deep in jax
        if model_params.pop("tp_axis", None) is not None:
            raise ValueError("model params must not set tp_axis — use "
                             "mesh: {data: N, model: M} instead")
        self.model = MODELS.build(cfg.model["name"], dtype=dtype, **model_params)
        self.tp_model = None
        if self.mesh2d is not None:
            # the TRAIN twin carries tp_axis (bank collectives are only
            # bound inside the step's shard_map); self.model stays
            # tp-free for init / eval / vis / export — identical params
            from dgvcc_tpu.parallel.tp import MODEL_AXIS

            try:
                self.tp_model = MODELS.build(cfg.model["name"], dtype=dtype,
                                             tp_axis=MODEL_AXIS,
                                             **model_params)
            except TypeError:
                raise ValueError(
                    f"model '{cfg.model['name']}' has no model-axis "
                    "sharding surface (tp_axis) — mesh: {model: M} "
                    "supports the DG memory-bank family")
            if getattr(self.tp_model, "tp_axis", None) != MODEL_AXIS:
                raise ValueError(
                    f"model '{cfg.model['name']}' ignores tp_axis — "
                    "mesh: {model: M} supports the DG memory-bank family")
            if not getattr(self.tp_model, "use_mem", False):
                raise ValueError(
                    f"model '{cfg.model['name']}' has no memory bank to "
                    "shard (use_mem=False) — a model axis would only "
                    "replicate work; use mesh: {data: N}")
            if self.tp_model.mem_size % mp:
                raise ValueError(
                    f"mem_size {self.tp_model.mem_size} does not divide "
                    f"over model={mp} shards")
        self.loss = LOSSES.build(cfg.loss["name"], **cfg.loss.get("params", {}))

        # device_aug: host ships raw uint8 pre-crops; the full two-view
        # augmentation runs on-device (data/device_pipeline.py). Built for
        # CPU-starved hosts; requires an MSE-mode den/den_cls dataset.
        self.device_aug = bool(cfg.extra.get("device_aug", False))
        self._train_crop = None

        self.loaders = {}
        for split in ("train", "val", "test"):
            spec = getattr(cfg, f"{split}_dataset")
            if spec is None:
                continue
            ds = DATASETS.build(spec["name"], method=split, **spec.get("params", {}))
            if split == "train" and self.device_aug:
                from dgvcc_tpu.data.datasets import RawCropDataset

                crop = spec.get("params", {}).get("crop_size", 320)
                self._train_crop = crop
                ds = RawCropDataset(ds, pre_crop=crop + 64)
            self.loaders[split] = build_loader(
                ds, getattr(cfg, f"{split}_loader") or {}, seed=cfg.seed
            )

        self.tx = build_optimizer(cfg.optimizer)
        # gradient accumulation (`accum_steps: k` extra): the optimizer
        # averages grads over k consecutive micro-batch steps and applies
        # one update — effective batch k×batch_size without the activation
        # memory. BN/SW batch stats still update per micro-batch (same
        # semantics as torch-side accumulation loops). Partial
        # accumulation carries across epoch boundaries (optax.MultiSteps).
        accum = int(cfg.extra.get("accum_steps", 1) or 1)
        if accum > 1:
            import optax

            self.tx = optax.MultiSteps(self.tx, every_k_schedule=accum)
        base_lr = cfg.optimizer.get("params", {}).get("lr", 1e-3)
        self.scheduler = build_scheduler(cfg.scheduler, base_lr)
        # `ema: 0.999` — Polyak-averaged shadow weights, updated inside
        # the fused train step; validate/test/vis/export all evaluate
        # the average (train/state.py). Beyond-reference. The configured
        # decay is PER OPTIMIZER UPDATE: under gradient accumulation the
        # shadow still updates every micro-step (params are constant
        # while accumulating, so k micro-decays of d^(1/k) toward the
        # same params compose to exactly one decay of d) — without the
        # root, `ema: 0.999, accum_steps: 8` would silently mean an 8x
        # shorter averaging horizon than the same config un-accumulated.
        ema = float(cfg.extra.get("ema", 0) or 0)
        if ema and not 0.0 < ema < 1.0:
            raise ValueError(f"ema must be in (0, 1); got {ema}")
        self.ema_decay = ema ** (1.0 / accum) if ema else 0.0
        if ema:
            self.log(f"EMA enabled: decay {ema} per optimizer update "
                     "(eval/export use the averaged weights)")

        crop = 64
        if cfg.train_dataset is not None:
            crop = cfg.train_dataset.get("params", {}).get("crop_size", 64)
        sample = jnp.zeros((1, crop, crop, 3), jnp.float32)

        # ---- reconstructed modes (train/genjoint.py) ----------------------
        self.joint = self.mode == "joint"
        custom_loss_fn = None
        if self.mode == "generation" and cfg.model["name"] not in ("gen", "gen0"):
            # reference configs say 'dgnet' here; the deleted trainer built
            # the Generator via get_models() (models2.py:513-516)
            self.model = MODELS.build("gen", dtype=dtype)
        if self.mode == "regression" and cfg.model["name"] not in ("reg_mem", "reg"):
            # same remap: reference sta_reg.yml says 'dgnet' but the
            # regression trainer drove DensityRegressorM (get_models())
            self.model = MODELS.build("reg_mem", dtype=dtype)
        if self.joint:
            from dgvcc_tpu.train.genjoint import build_joint_step

            self.gen_model = MODELS.build("gen", dtype=dtype)
            self.reg_model = MODELS.build("reg_mem", dtype=dtype)
            self.model = self.reg_model  # counting model for eval
            self.gen_tx = build_optimizer(cfg.optimizer)
            if accum > 1:
                self.gen_tx = optax.MultiSteps(self.gen_tx,
                                               every_k_schedule=accum)
            self.gen_state = create_train_state(
                self.gen_model, jax.random.PRNGKey(cfg.seed + 7), sample,
                self.gen_tx, ema_decay=self.ema_decay
            )
            self.state = create_train_state(
                self.reg_model, jax.random.PRNGKey(cfg.seed), sample,
                self.tx, ema_decay=self.ema_decay
            )
            if self.dp_mesh is not None:
                from dgvcc_tpu.parallel.mesh import (
                    build_parallel_joint_step, replicate)

                self.joint_step = build_parallel_joint_step(
                    self.gen_model, self.reg_model, self.loss, self.log_para,
                    self.dp_mesh, donate=cfg.donate)
                self.gen_state = replicate(self.dp_mesh, self.gen_state)
                self.state = replicate(self.dp_mesh, self.state)
                self.log(f"Joint data parallel over {dp} devices")
            else:
                self.joint_step = build_joint_step(
                    self.gen_model, self.reg_model, self.loss, self.log_para
                )
        else:
            if self.mode == "generation":
                from dgvcc_tpu.train.genjoint import build_generation_loss

                custom_loss_fn = build_generation_loss(self.model)
            elif self.mode == "regression":
                from dgvcc_tpu.train.genjoint import build_regression_loss

                custom_loss_fn = build_regression_loss(self.model, self.loss,
                                                       self.log_para)
            elif self.mode == "discrimination":
                from dgvcc_tpu.train.genjoint import build_discrimination_loss

                custom_loss_fn = build_discrimination_loss(self.model, self.loss,
                                                           self.log_para)
            self.state = create_train_state(
                self.model, jax.random.PRNGKey(cfg.seed), sample, self.tx,
                ema_decay=self.ema_decay
            )
            # 'nocon' ablation: zero the final-mode consistency weight
            con_weight = 0.0 if cfg.extra.get("no_consistency") else 10.0
            if self.mesh2d is not None:
                if custom_loss_fn is not None:
                    raise ValueError(f"mesh: {{model: {mp}}} is not "
                                     f"supported for mode '{self.mode}'")
                from dgvcc_tpu.parallel.mesh import (
                    build_parallel_train_step_2d, shard_state_2d)

                self.train_step = build_parallel_train_step_2d(
                    self.tp_model, self.loss, self.mode, self.log_para,
                    self.mesh2d, donate=cfg.donate, con_weight=con_weight)
                self.state = shard_state_2d(self.mesh2d, self.state)
                self.log(f"2-D mesh: data={dp} x model={mp} (memory bank "
                         "sharded)")
            elif self.dp_mesh is not None:
                from dgvcc_tpu.parallel import build_parallel_train_step
                from dgvcc_tpu.parallel.mesh import replicate

                self.train_step = build_parallel_train_step(
                    self.model, self.loss, self.mode, self.log_para,
                    self.dp_mesh, donate=cfg.donate, loss_fn=custom_loss_fn,
                    con_weight=con_weight)
                self.state = replicate(self.dp_mesh, self.state)
                self.log(f"Data parallel over {dp} devices")
            elif self.sp_mesh is not None:
                from dgvcc_tpu.parallel.mesh import replicate
                from dgvcc_tpu.parallel.spatial import \
                    build_spatial_train_step

                self.train_step = build_spatial_train_step(
                    self.model, self.loss, self.mode, self.log_para,
                    self.sp_mesh, donate=cfg.donate, loss_fn=custom_loss_fn,
                    con_weight=con_weight)
                self.state = replicate(self.sp_mesh, self.state)
                self.log(f"Spatial parallel over "
                         f"{self.sp_mesh.devices.size} devices "
                         "(crop height sharded, GSPMD halo exchange)")
            else:
                self.train_step = jit_train_step(
                    build_train_step(self.model, self.loss, self.mode,
                                     self.log_para, loss_fn=custom_loss_fn,
                                     con_weight=con_weight),
                    donate=cfg.donate,
                )

        # pretrained ImageNet backbones: config key
        #   pretrained_weights: {vgg16_bn: /path/to/vgg16_bn.pth}
        # (reference downloads these from torchvision, models.py:35 —
        # no network here, so the user supplies the files)
        weights = cfg.extra.get("pretrained_weights")
        if weights and cfg.model.get("params", {}).get("pretrained", True):
            from dgvcc_tpu.nn.torch_io import load_pretrained_backbone
            from flax.core import unfreeze

            variables = {"params": unfreeze(self.state.params),
                         "batch_stats": unfreeze(self.state.batch_stats)}
            variables, desc = load_pretrained_backbone(
                variables, cfg.model["name"], weights,
                model_params=cfg.model.get("params", {}))
            self.state = self.state.replace(
                params=variables["params"],
                batch_stats=variables["batch_stats"],
                # jnp.copy: an aliased seed would be donated twice by
                # the train step (donate_argnums)
                ema_params=(jax.tree.map(jnp.copy, variables["params"])
                            if self.state.ema_params is not None else None))
            self.log(f"Loaded pretrained backbone: {desc}")

        def apply_fn(variables, tiles):
            return self.model.apply(variables, tiles)

        # eval tiling size: BaseTrainer-family models tile predictions
        # at a hard-coded 800 px in the reference (basetrainer.py:51-66)
        # — honor that for metric parity; DGTrainer models use the
        # config patch_size (dgtrainer.py:71-84). ``eval_patch_size``
        # in the config overrides either.
        eval_ps = self.cfg.extra.get("eval_patch_size")
        if eval_ps is None:
            eval_ps = (800 if cfg.model["name"] in _BASETRAINER_MODELS
                       else self.patch_size)
        self.eval_patch_size = int(eval_ps)
        eval_mesh = self.dp_mesh
        if self.mesh2d is not None:
            # eval runs the tp-free twin: re-purpose ALL dp*mp chips as
            # a 1-D data mesh for tile counting (the bank resharding
            # from the 2-D layout is a one-off device_put per eval)
            from dgvcc_tpu.parallel import make_mesh

            eval_mesh = make_mesh(dp * mp)
        if eval_mesh is not None:
            # shard the val/test tile batches over the data axis — all
            # chips count, instead of N-1 idling through the eval loop
            from dgvcc_tpu.parallel.eval import ShardedTiledCounter

            self.counter = ShardedTiledCounter(
                apply_fn, self.log_para, self.eval_patch_size,
                eval_mesh)
        else:
            self.counter = TiledCounter(apply_fn, self.log_para,
                                        self.eval_patch_size)
        self.rng = jax.random.PRNGKey(cfg.seed + 1)

        # ISW two-pass covariance protocol (dgtrainer.py:86-102).
        # Model param wt_type: 'isw' (default, accumulated sensitive-cov
        # masks) or 'irw' (static off-diagonal masks with margin,
        # CovMatrix_IRW / wt_layer code 1, cov_settings.py:91-107).
        self.isw_tracker = None
        if self.mode == "isw":
            from dgvcc_tpu.models.whitening import IrwCovTracker, IswCovTracker

            tracker_cls = (
                IrwCovTracker
                if cfg.model.get("params", {}).get("wt_type", "isw") == "irw"
                else IswCovTracker)
            self.isw_tracker = tracker_cls(
                relax_denom=cfg.model.get("params", {}).get("relax_denom", 2.0),
                clusters=cfg.model.get("params", {}).get("clusters", 3),
            )

            @jax.jit
            def cov_stats(variables, x2):
                return self.model.apply(variables, x2, method=self.model.cov_stats)

            self._cov_stats = cov_stats
        self._built = True

    def _variables(self):
        """Eval/export weights: the EMA shadow when `ema:` is on (the
        point of keeping an average is to evaluate it), raw params
        otherwise. Batch stats are shared — the running stats are
        already an exponential average."""
        p = self.state.params
        if getattr(self.state, "ema_params", None) is not None:
            p = self.state.ema_params
        return {"params": p, "batch_stats": self.state.batch_stats}

    def load_ckpt(self, path, strict: bool = False):
        """Accepts a single path or a [gen_ckpt, reg_ckpt] 2-list
        (dgtrainer.py:35-41). ``strict`` raises on any missing/
        unexpected/mismatched weight instead of warning (optimizer-state
        mismatches stay tolerated) — the export path uses it so a wrong
        checkpoint can never silently export random-init weights."""
        if path is None:
            return
        if isinstance(path, (list, tuple)):
            # defensive like the reference's indexed access
            # (dgtrainer.py:35-41): [gen] alone is accepted; extras error
            # with a message instead of a bare unpack failure
            if not 1 <= len(path) <= 2:
                raise ValueError(
                    f"pair checkpoint must be [gen_ckpt, reg_ckpt] or "
                    f"[gen_ckpt]; got {len(path)} entries: {path!r}")
            if not self.joint:
                if len(path) == 1:
                    # a 1-list on a single-model trainer (e.g. a
                    # generation-mode config) means THE model's ckpt —
                    # falling into the pair branch would silently load
                    # nothing
                    return self.load_ckpt(path[0], strict=strict)
                self.log(f"[ckpt] non-joint config: loading {path[1]} "
                         f"into the model; generator entry {path[0]} "
                         "ignored")
            gen_path = path[0]
            reg_path = path[1] if len(path) > 1 else None
            extra = {}
            if gen_path and self.joint:
                self.log(f"Loading generator checkpoint from {gen_path}")
                if str(gen_path).endswith((".pth", ".pt")):
                    self.gen_state = self._convert_reference_pth(
                        gen_path, self.gen_state, self.gen_model)
                else:
                    self.gen_state, extra, _ = load_checkpoint(
                        gen_path, self.gen_state, strict=strict)
            if reg_path:
                self.log(f"Loading regressor checkpoint from {reg_path}")
                if str(reg_path).endswith((".pth", ".pt")):
                    self.state = self._convert_reference_pth(
                        reg_path, self.state, self.model)
                else:
                    self.state, extra, _ = load_checkpoint(
                        reg_path, self.state, strict=strict)
            # pair checkpoints carry the same extra — resume exactly too
            self._resume = extra if isinstance(extra, dict) and "epoch" in extra else None
            if self._resume and self.scheduler is not None and "scheduler" in self._resume:
                try:
                    self.scheduler.load_state_dict(
                        {k: (v.item() if hasattr(v, "item") else v)
                         for k, v in self._resume["scheduler"].items()})
                except Exception as e:
                    self.log(f"  [ckpt] scheduler state not restored: {e}")
            return
        if str(path).endswith((".pth", ".pt")):
            # migration path: a TRAINED reference checkpoint (torch
            # state_dict) converts in place — reference users bring
            # trained weights (DG family, 'gen', 'reg_mem')
            self.log(f"Converting reference checkpoint {path}")
            self.state = self._convert_reference_pth(path, self.state,
                                                     self.model)
            self._resume = None  # reference ckpts carry weights only
            return
        self.log(f"Loading checkpoint from {path}")
        self.state, extra, warnings = load_checkpoint(path, self.state,
                                                      strict=strict)
        for w in warnings[:10]:
            self.log(f"  [ckpt] {w}")
        # exact resume: restore epoch/best/scheduler from the ckpt extra
        self._resume = extra if isinstance(extra, dict) and "epoch" in extra else None
        if self._resume and self.scheduler is not None and "scheduler" in self._resume:
            try:
                self.scheduler.load_state_dict(
                    {k: (v.item() if hasattr(v, "item") else v)
                     for k, v in self._resume["scheduler"].items()})
            except Exception as e:
                self.log(f"  [ckpt] scheduler state not restored: {e}")

    def _convert_reference_pth(self, path, state, model):
        from flax.core import unfreeze

        from dgvcc_tpu.nn.torch_io import (
            load_reference_checkpoint, load_torch_state_dict)

        sd = load_torch_state_dict(path)
        variables = load_reference_checkpoint(
            {"params": unfreeze(state.params),
             "batch_stats": unfreeze(state.batch_stats)}, sd, model)
        return state.replace(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            # re-seed the EMA shadow (a copy — aliased buffers would be
            # donated twice): averaging from random init toward migrated
            # weights would poison early evals
            ema_params=(jax.tree.map(jnp.copy, variables["params"])
                        if state.ema_params is not None else None))

    def _ckpt_extra(self, epoch, best):
        extra = {"epoch": epoch, "best": best}
        if self.scheduler is not None:
            extra["scheduler"] = self.scheduler.state_dict()
        return extra

    def _save_last(self, epoch, best):
        extra = self._ckpt_extra(epoch, best)
        if self.joint:
            self.rotator.save_last_pair(self.gen_state, self.state, extra)
        else:
            self.rotator.save_last(self.state, extra)

    def _save_best(self, epoch, criterion):
        if self.joint:
            self.rotator.save_best_pair(self.gen_state, self.state, epoch,
                                        criterion,
                                        self._ckpt_extra(epoch, criterion))
        else:
            self.rotator.save_best(self.state, epoch, criterion)

    # ---- loops -------------------------------------------------------------

    def train_epoch(self, epoch: int, best_criterion: float, best_epoch: int):
        start = time.time()
        self._epoch = epoch
        if self.scheduler is not None:
            self.state = self.state.set_learning_rate(self.scheduler.current_lr)
            if self.joint:
                self.gen_state = self.gen_state.set_learning_rate(
                    self.scheduler.current_lr)

        # optional profiler trace of this epoch (config: profile_epoch: N)
        profile_epoch = self.cfg.extra.get("profile_epoch")
        if profile_epoch is not None and epoch == profile_epoch:
            trace_dir = os.path.join(self.log_dir, "trace")
            jax.profiler.start_trace(trace_dir)
            self.log(f"[profiler] tracing epoch {epoch} -> {trace_dir}")

        train_loader = self.loaders["train"]
        train_loader.set_epoch(epoch)
        metrics = None
        isw_extra = {}
        if self.isw_tracker is not None:
            masks, nums, margins = self.isw_tracker.mask_batch()
            isw_extra = {"isw_masks": masks, "isw_nums": nums,
                         "isw_margins": margins}
        for batch in self._progress(train_loader,
                                    f"Epoch {epoch}: Training..."):
            if self._preempted:
                # mid-epoch preemption: persist the last COMPLETED epoch
                # (resume redoes this one) instead of risking the grace
                # window on the rest of the epoch + validation
                self._save_last(epoch - 1, best_criterion)
                self.log(f"Preemption: saved last.ckpt at epoch {epoch - 1}"
                         " (mid-epoch stop)")
                return best_criterion, best_epoch
            if self.device_aug:
                from dgvcc_tpu.data.device_pipeline import augment_two_view_batch

                self.rng, aug_rng = jax.random.split(self.rng)
                batch = augment_two_view_batch(
                    jnp.asarray(batch["frames_u8"]), jnp.asarray(batch["dmaps"]),
                    aug_rng, crop=self._train_crop,
                )
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()
                         if k in ("img1", "img2", "dmap", "bmap", "points",
                                  "pt_mask", "targets", "st_sizes")}
            if getattr(self, "dp_mesh", None) is not None:
                if jax.process_count() > 1:
                    # each host contributes its own per-host rows (the
                    # DistributedSampler slice) to the global batch
                    from dgvcc_tpu.parallel.multihost import host_shard_batch

                    batch = host_shard_batch(self.dp_mesh, batch)
                else:
                    from dgvcc_tpu.parallel import shard_batch

                    batch = shard_batch(self.dp_mesh, batch)
            batch.update(isw_extra)
            self.rng, step_rng = jax.random.split(self.rng)
            if self.joint:
                self.gen_state, self.state, metrics = self.joint_step(
                    self.gen_state, self.state, batch, step_rng, jnp.int32(epoch)
                )
            else:
                self.state, metrics = self.train_step(
                    self.state, batch, step_rng, jnp.int32(epoch)
                )
        if profile_epoch is not None and epoch == profile_epoch:
            jax.profiler.stop_trace()
        # read the loss back ONCE per epoch — a per-batch float() would
        # force a host sync every step (expensive over the device link)
        train_loss = float(metrics["loss_total"]) if metrics is not None else float("nan")
        # NaN guard: a non-finite loss means the run is dead — fail
        # loudly instead of training garbage for hours
        if metrics is not None and not np.isfinite(train_loss):
            raise FloatingPointError(
                f"non-finite training loss at epoch {epoch}: "
                f"{jax.device_get(metrics)}"
            )
        self.log(f"Epoch {epoch}: Training loss: {train_loss:.4f} "
                 f"Version: {self.cfg.version}")
        if self.tb.enabled and metrics is not None:
            # one extra device_get per EPOCH, only when tb is on
            self.tb.scalars({k: float(v) for k, v in
                             jax.device_get(metrics).items()},
                            epoch, prefix="train/")
            if self.scheduler is not None:
                self.tb.scalar("train/lr", self.scheduler.current_lr, epoch)

        # scheduler steps per epoch, before validation (trainer.py:82-87)
        prev_criterion = getattr(self, "_last_criterion", None)
        if self.scheduler is not None:
            self.scheduler.step(prev_criterion)

        criterion = self.validate(epoch, best_criterion)
        self._last_criterion = criterion
        if self.tb.enabled:
            self.tb.scalar("val/criterion", criterion, epoch)
            self.tb.scalars(getattr(self, "_last_val_extra", {}), epoch,
                            prefix="val/")
            self.tb.scalar("time/epoch_s", time.time() - start, epoch)
            self.tb.flush()

        if criterion < best_criterion:
            best_criterion = criterion
            best_epoch = epoch
            self._save_last(epoch, best_criterion)
            self.log(f"Epoch {epoch}: saving best model...")
            self._save_best(epoch, criterion)
        else:
            self._save_last(epoch, best_criterion)
        return best_criterion, best_epoch

    def validate(self, epoch: int, best_criterion: float) -> float:
        crit = AverageMeter()
        extra = DictAvgMeter()
        start = time.time()
        variables = self._variables()

        if self.mode == "generation":
            # generator quality = reconstruction error of the aug view,
            # masked to the real image (the bucket padding region would
            # otherwise bias the criterion by the aspect ratio)
            if not hasattr(self, "_gen_recon"):
                @jax.jit
                def _gen_recon(variables, img1, img2, mask):
                    out = self.model.apply(variables, img2)
                    err = (out.astype(jnp.float32)
                           - img1.astype(jnp.float32)) ** 2 * mask
                    return jnp.sum(err) / (jnp.sum(mask) * img1.shape[-1])
                self._gen_recon = _gen_recon
            for sample in self.loaders["val"]:
                tiles1, mask = self.counter._whole_image(sample["img1"])
                tiles2, _ = self.counter._whole_image(sample.get("img2", sample["img1"]))
                mse = float(self._gen_recon(variables, jnp.asarray(tiles1),
                                            jnp.asarray(tiles2),
                                            jnp.asarray(mask)))
                crit.update(mse)
            self.log(f"Epoch {epoch}: Val criterion: {crit.avg:.4f}", end=" ")
            self.log(f"best: {best_criterion:.4f}, time: {time.time() - start:.4f}")
            self._last_val_extra = {}
            return crit.avg

        for sample in self._progress(self.loaders["val"],
                                     f"Epoch {epoch}: Validating..."):
            pred = self.counter.count(variables, sample["img1"])
            if self.isw_tracker is not None and "img2" in sample:
                # predict2: accumulate covariance stats from the two
                # augmented views, per patch for large images
                # (dgtrainer.py:89-96) and whole-image otherwise
                h, w, _ = sample["img1"].shape
                if h >= self.patch_size or w >= self.patch_size:
                    from dgvcc_tpu.ops.tiling import tile_image

                    t1, _, nh, nw = tile_image(sample["img1"], self.patch_size)
                    t2, _, _, _ = tile_image(sample["img2"], self.patch_size)
                    # only the nh*nw REAL tiles — the bucket padding is
                    # black filler that would skew the covariance stats
                    pairs = [(t1[i : i + 1], t2[i : i + 1])
                             for i in range(nh * nw)]
                else:
                    tiles1, _ = self.counter._whole_image(sample["img1"])
                    tiles2, _ = self.counter._whole_image(sample["img2"])
                    pairs = [(tiles1, tiles2)]
                for a, b in pairs:
                    x2 = jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], axis=0)
                    stats = self._cov_stats(variables, x2)
                    self.isw_tracker.add({k: np.asarray(v) for k, v in stats.items()})
            gt_count = float(len(sample["gt"]))
            mae = abs(pred - gt_count)
            crit.update(mae)
            extra.update({"mse": (pred - gt_count) ** 2})
        if self.isw_tracker is not None and self.isw_tracker.has_stats():
            if jax.process_count() > 1:
                # pod run: every host accumulates the FULL val set (val
                # loaders are never sampler-sharded), so host stats are
                # logically identical; the allgather MEAN enforces
                # bitwise-identical masks across hosts (per-host float
                # nondeterminism would otherwise break the isw_ mask
                # replication contract of multihost.host_shard_batch) and
                # keeps var/count at full-set scale. Every process
                # reaches this collective in lockstep because validate()
                # runs the same loop on each host. If val sharding is
                # ever added, the mean keeps the var/count RATIO exact.
                from dgvcc_tpu.parallel.multihost import allgather_mean

                merged = allgather_mean({"var": self.isw_tracker.var,
                                         "count": np.asarray(self.isw_tracker.count, np.float64)})
                self.isw_tracker.var = list(merged["var"])
                self.isw_tracker.count = float(merged["count"])
            self.isw_tracker.set_mask_matrix()
        self.log(f"Epoch {epoch}: Val criterion: {crit.avg:.4f}", end=" ")
        for k, v in extra.avg.items():
            self.log(f"{k}: {v:.4f}", end=" ")
        self.log(f"best: {best_criterion:.4f}, time: {time.time() - start:.4f}")
        self._last_val_extra = dict(extra.avg)
        return crit.avg

    def _early_stop(self, epoch: int, best_epoch: int,
                    best_criterion: float) -> bool:
        """`early_stop: N` — stop when the val criterion hasn't improved
        for N consecutive epochs (beyond-reference; the reference always
        runs every configured epoch). Works under resume: best_epoch is
        restored from the checkpoint extra."""
        patience = int(self.cfg.extra.get("early_stop", 0) or 0)
        if patience and epoch - best_epoch >= patience:
            self.log(f"Early stopping at epoch {epoch}: no val "
                     f"improvement for {patience} epochs "
                     f"(best {best_criterion:.4f} at epoch {best_epoch})")
            return True
        return False

    def _resume_point(self):
        """(start_epoch, best_criterion, best_epoch) after a ckpt load."""
        r = getattr(self, "_resume", None)
        if r:
            epoch = int(np.asarray(r["epoch"]))
            best = float(np.asarray(r.get("best", 1e10)))
            self.log(f"Resuming from epoch {epoch} (best {best:.4f})")
            return epoch + 1, best, epoch
        return 0, 1e10, -1

    def train(self, checkpoint=None, num_epochs: Optional[int] = None):
        self.build()
        self.log(f"Start training at {get_current_datetime()}")
        self.load_ckpt(checkpoint if checkpoint is not None else self.cfg.checkpoint)
        start_epoch, best_criterion, best_epoch = self._resume_point()
        try:
            with self._graceful_shutdown(lambda: (best_criterion, best_epoch)):
                for epoch in range(start_epoch,
                                   num_epochs or self.cfg.num_epochs):
                    best_criterion, best_epoch = self.train_epoch(
                        epoch, best_criterion, best_epoch)
                    if self._preempted:
                        self.log(f"Preemption: stopped after epoch {epoch}; "
                                 "resume from last.ckpt")
                        break
                    if self._early_stop(epoch, best_epoch, best_criterion):
                        break
        finally:
            # deferred saves must hit disk even when the epoch loop
            # raises (NaN guard, loader error) — otherwise async_save
            # would drop the very checkpoint a crash-resume needs
            self.rotator.flush()
            self.tb.close()
        self.log(f"Best epoch: {best_epoch}, best criterion: {best_criterion}")
        self.log(f"Training results saved to {self.log_dir}")
        self.log(f"End training at {get_current_datetime()}")
        return best_criterion, best_epoch

    # ---- preemption safety ------------------------------------------------
    # TPU pods are preemptible; SIGTERM arrives with a grace window. The
    # handler only sets a flag — the epoch loop finishes the in-flight
    # epoch (validate + save last.ckpt as usual, so the full state incl.
    # optimizer/epoch/best lands on disk) and exits cleanly; resume via
    # the config `checkpoint:` key or CLI --ckpt restores exactly.
    # (The reference loses everything since its last epoch-end save too,
    # but has no handler at all — a mid-save SIGTERM kills it.)
    _preempted = False

    @contextmanager
    def _graceful_shutdown(self, _state_fn):
        import signal

        self._preempted = False

        def handler(signum, _frame):
            self._preempted = True
            self.log(f"Received signal {signum}: finishing the current "
                     "epoch, saving last.ckpt, then exiting")

        prev = {}
        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    prev[sig] = signal.signal(sig, handler)
                except ValueError:  # non-main thread: no handler possible
                    pass
            yield
        finally:
            for sig, h in prev.items():
                signal.signal(sig, h)

    def _quantized_counter(self, calib_samples):
        """Int8 PTQ eval counter (config extra ``test_quantized: true``).

        Builds the quantized serving graph (nn/quant.py) from the
        current weights, calibrated on the given test samples, and wraps
        it in a TiledCounter so arbitrary-size evaluation works
        unchanged. Supports the DG family and the conv(+BN) baselines
        (csrnet/mcnn/bl/sasnet/dssinet/cctrans); ~1.5x eval throughput on v5e at ~1%
        count drift (BENCH_NOTES.md)."""
        from flax.core import unfreeze

        from dgvcc_tpu.nn.quant import build_quantized

        variables = {"params": unfreeze(self.state.params),
                     "batch_stats": unfreeze(self.state.batch_stats)}
        imgs = [s["img1"] for s in calib_samples]
        if not imgs:
            raise ValueError("test_quantized: empty test loader — nothing "
                             "to calibrate activation scales on")
        # one static square crop size across the calib batch
        s = min(256, *(min(i.shape[0], i.shape[1]) for i in imgs))
        calib = np.stack([i[:s, :s] for i in imgs])
        q = build_quantized(self.model, variables,
                            jnp.asarray(calib, jnp.float32))

        def apply_fn(_variables, tiles):
            return q._forward(q.qparams, tiles)

        return TiledCounter(apply_fn, self.log_para, self.eval_patch_size)

    def test(self, checkpoint=None, loader=None):
        self.build()
        self.log(f"Start testing at {get_current_datetime()}")
        if checkpoint is not None:
            self.load_ckpt(checkpoint)
        loader = loader or self.loaders["test"]
        meter = DictAvgMeter()
        variables = self._variables()
        counter = self.counter
        sample_iter = loader
        if self.cfg.extra.get("test_quantized"):
            # local counter only — validate() keeps the fp path. The
            # calibration samples are replayed into the metric loop so a
            # one-shot iterator loses nothing.
            import itertools

            it = iter(loader)
            calib_samples = list(itertools.islice(it, 4))
            counter = self._quantized_counter(calib_samples)
            sample_iter = itertools.chain(calib_samples, it)
            self.log("Testing through the int8 PTQ serving graph")

        if self.mode == "generation":
            # the generator has no density output — test = reconstruction
            # error (same metric as validate's generation branch)
            self.validate(-1, 1e10)
            self.log(f"End testing at {get_current_datetime()}")
            return {}
        rows = []
        for i, sample in enumerate(self._progress(sample_iter, "Testing...")):
            pred = counter.count(variables, sample["img1"])
            gt_count = float(len(sample["gt"]))
            meter.update({"mae": abs(pred - gt_count),
                          "mse": (pred - gt_count) ** 2})
            rows.append((str(sample.get("name", i)), gt_count, float(pred)))
        if self.cfg.extra.get("test_report"):
            # `test_report: true` — per-image CSV (name, gt, pred, error)
            # worst-first, for error analysis beyond the aggregate MAE/MSE
            # line (the reference only ever logs the aggregate,
            # trainer.py:148-153). A string value names the output file.
            tr = self.cfg.extra["test_report"]
            path = (os.path.join(self.log_dir, "test_report.csv")
                    if tr is True else str(tr))
            import csv

            with open(path, "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["name", "gt_count", "pred_count", "abs_err"])
                for name, gt, pred in sorted(
                        rows, key=lambda r: -abs(r[2] - r[1])):
                    w.writerow([name, f"{gt:.1f}", f"{pred:.3f}",
                                f"{abs(pred - gt):.3f}"])
            self.log(f"Per-image test report: {path} ({len(rows)} rows)")
        self.log("Testing results:", end=" ")
        for k, v in meter.avg.items():
            self.log(f"{k}: {v:.4f}", end=" ")
        self.log("")

        # hard-coded re-save thresholds (trainer.py:154-160)
        test_mae = meter.avg["mae"]
        threshold = 15.5 if self.cfg.version.startswith("sta") else 105
        if test_mae < threshold:
            self.log("Saving test model...")
            self.rotator.save_test(self.state, test_mae)
            self.rotator.flush()
        self.log(f"Testing results saved to {self.log_dir}")
        self.log(f"End testing at {get_current_datetime()}")
        if self.tb.enabled:
            # inside train_and_test the step is the epoch that triggered
            # this test; standalone --task test logs at step 0
            self.tb.scalars(meter.avg, getattr(self, "_epoch", 0),
                            prefix="test/")
            self.tb.flush()
        return meter.avg

    def _test_every_epoch(self) -> bool:
        """The reference has two train_and_test protocols: DGTrainer
        tests only when val improves (dgtrainer.py:301-327), while
        BaseTrainer — which drove the classic baselines and the dgnet
        regressors through main_base.py — tests after EVERY epoch
        (basetrainer.py:149-173). Config key ``test_every_epoch``
        overrides; default follows the reference's model→trainer split.
        """
        knob = self.cfg.extra.get("test_every_epoch")
        if knob is not None:
            return bool(knob)
        return self.cfg.model["name"] in _BASETRAINER_MODELS

    def train_and_test(self, checkpoint=None, num_epochs: Optional[int] = None):
        """Test on the target domain when val improves (dgtrainer.py:
        301-327), or every epoch for the BaseTrainer-family models
        (see _test_every_epoch)."""
        self.build()
        every_epoch = self._test_every_epoch()
        self.log(f"Start training and testing at {get_current_datetime()}")
        self.load_ckpt(checkpoint if checkpoint is not None else self.cfg.checkpoint)
        start_epoch, best_criterion, best_epoch = self._resume_point()
        for epoch in range(start_epoch, num_epochs or self.cfg.num_epochs):
            prev = best_criterion
            best_criterion, best_epoch = self.train_epoch(epoch, best_criterion, best_epoch)
            if every_epoch or best_criterion < prev:
                self.test()
            if self._early_stop(epoch, best_epoch, best_criterion):
                break
        self.log(f"Best epoch: {best_epoch}, best criterion: {best_criterion}")
        self.log(f"Training results saved to {self.log_dir}")
        self.log(f"End training and testing at {get_current_datetime()}")
        return best_criterion, best_epoch

    # ---- visualization -----------------------------------------------------

    def vis(self, checkpoint=None):
        self.build()
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from dgvcc_tpu.utils.misc import denormalize

        self.log(f"Start visualization at {get_current_datetime()}")
        if checkpoint is not None:
            self.load_ckpt(checkpoint)
        vis_dir = os.path.join(self.log_dir, "vis")
        os.makedirs(vis_dir, exist_ok=True)
        variables = self._variables()
        has_cls = getattr(self.model, "use_cls", False) and self.mode != "base"

        for sample in self._progress(self.loaders["test"],
                                     "Visualizing..."):
            name = sample["name"]
            img1 = sample["img1"]
            img2 = sample.get("img2", img1)
            gt_count = len(sample["gt"])

            dmap1 = self.counter.density_map(variables, img1)
            dmap2 = self.counter.density_map(variables, img2)
            c1 = self.counter.count(variables, img1)
            c2 = self.counter.count(variables, img2)
            im1 = np.clip(denormalize(img1), 0, 1)
            im2 = np.clip(denormalize(img2), 0, 1)

            if not has_cls:
                datas = [im1, dmap1, im2, dmap2]
                titles = [name, f"Pred1: {c1:.2f}", f"GT: {gt_count}", f"Pred2: {c2:.2f}"]
                fig = plt.figure(figsize=(10, 6))
                for i, (d, t) in enumerate(zip(datas, titles)):
                    ax = fig.add_subplot(2, 2, i + 1)
                    ax.set_title(t)
                    ax.imshow(d)
            else:
                cmap1 = self._cls_map(variables, img1)
                cmap2 = self._cls_map(variables, img2)
                datas = [im1, dmap1, cmap1, im2, dmap2, cmap2]
                titles = [name, f"Pred1: {c1:.2f}", "Cls1",
                          f"GT: {gt_count}", f"Pred2: {c2:.2f}", "Cls2"]
                fig = plt.figure(figsize=(15, 6))
                for i, (d, t) in enumerate(zip(datas, titles)):
                    ax = fig.add_subplot(2, 3, i + 1)
                    ax.set_title(t)
                    ax.imshow(d)
                plt.imsave(os.path.join(vis_dir, f"{name}_Cls.png"), cmap1)
                plt.imsave(os.path.join(vis_dir, f"{name}_BCls.png"),
                           (cmap1 >= 0.5).astype(np.float32))
                plt.imsave(os.path.join(vis_dir, f"{name}_Pred_{c1:.2f}.png"), dmap1)
            fig.savefig(os.path.join(vis_dir, f"{name}.png"))
            plt.close(fig)
        self.log(f"Visualization results saved to {self.log_dir}")
        self.log(f"End visualization at {get_current_datetime()}")

    def generate(self, checkpoint=None):
        """Emit restyled training images with a trained generator into
        ``{log_dir}/gen`` as ``{name}_a.jpg`` — consumable via the
        datasets' gen_root option (generated names alias the source gt by
        stripping the suffix, base_dataset.py:89-92)."""
        self.build()
        from PIL import Image as PILImage
        from dgvcc_tpu.utils.misc import denormalize

        if self.mode != "generation" and not self.joint:
            raise ValueError("generate requires mode 'generation' or 'joint'")
        if checkpoint is not None:
            self.load_ckpt(checkpoint)
        gen_dir = os.path.join(self.log_dir, "gen")
        os.makedirs(gen_dir, exist_ok=True)
        model = self.gen_model if self.joint else self.model
        state = self.gen_state if self.joint else self.state
        params = (state.ema_params if getattr(state, "ema_params", None)
                  is not None else state.params)
        variables = {"params": params, "batch_stats": state.batch_stats}

        if not hasattr(self, "_gen_fn"):
            @jax.jit
            def run(variables, x):
                return model.apply(variables, x)
            self._gen_fn = run

        # iterate the train split through its val-style loader contract:
        # reuse the train dataset's underlying file list with the clean +
        # photometric pair produced per-sample
        ds = self.loaders["train"].dataset
        base = getattr(ds, "base", ds)  # unwrap RawCropDataset
        import random as _random
        from dgvcc_tpu.data import transforms as T

        photo = T.TwoViewPhotometric()
        for idx, img_fn in enumerate(base.img_fns):
            name = os.path.basename(img_fn).rsplit(".", 1)[0]
            out_path = os.path.join(gen_dir, f"{name}_a.jpg")
            if os.path.exists(out_path):
                continue
            img, _ = base._load_img(img_fn)
            rng = _random.Random(f"gen:{self.cfg.seed}:{idx}")
            # pad to stride-16 multiple for the generator
            w, h = img.size
            nw = (w + 15) // 16 * 16
            nh = (h + 15) // 16 * 16
            img_p = T.pil_pad(photo(img, rng), (0, 0, nw - w, nh - h))
            x = jnp.asarray(T.to_tensor_normalize(img_p))[None]
            out = np.asarray(self._gen_fn(variables, x))[0, :h, :w]
            out = np.clip(denormalize(out), 0, 1)
            PILImage.fromarray((out * 255).astype(np.uint8)).save(out_path,
                                                                  quality=95)
        self.log(f"Generated images saved to {gen_dir}")
        return gen_dir

    def _cls_map(self, variables, img):
        """Whole-image classifier map (stride-16, sigmoid probs)."""
        h, w, _ = img.shape
        tiles, _ = self.counter._whole_image(img)
        if not hasattr(self, "_cls_fn"):
            @jax.jit
            def run(variables, x):
                out = self.model.apply(variables, x)
                return out[1] if isinstance(out, tuple) else None
            self._cls_fn = run
        c = self._cls_fn(variables, jnp.asarray(tiles))
        return np.asarray(c)[0, : h // 16, : w // 16, 0]
