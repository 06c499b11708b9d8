"""Experiment CLI.

Same public surface as the reference (main.py:142-160):

    python -m dgvcc_tpu.cli.main --config configs/X.yml \
        --task {train,test,vis,train_test}

The YAML schema is the reference's (core/config.py). Unlike the
reference's twin CLIs (main.py + main_base.py with a broken import,
main_base.py:19), all model families share one registry and one entry
point.
"""

from __future__ import annotations

import argparse
import os
import shutil


def _list_images(frames_dir: str):
    exts = (".jpg", ".jpeg", ".png", ".bmp")
    names = sorted(fn for fn in os.listdir(frames_dir)
                   if fn.lower().endswith(exts))
    if not names:
        raise SystemExit(f"no images under {frames_dir}")
    return names


def _load_calib(frames_dir: str, n: int = 4):
    """First few frames of a directory, resized for scale calibration."""
    import numpy as np
    from PIL import Image

    names = _list_images(frames_dir)
    return np.stack([
        np.asarray(Image.open(os.path.join(frames_dir, fn))
                   .convert("RGB").resize((256, 256)), np.uint8)
        for fn in names[:max(1, n)]])


def _quantize(cfg, frames_dir: str, out: str):
    """Build + save an int8 serving artifact (nn/quant_io.py): fold BN,
    calibrate activation scales on real frames from --frames, quantize,
    and write one deployable file. Replicas then serve it with
    `--task serve --artifact OUT` — no checkpoint or calibration
    imagery at deploy time."""
    from dgvcc_tpu.nn.quant_io import save_quantized
    from dgvcc_tpu.serve import VideoCounter

    if cfg.checkpoint is None:
        raise SystemExit("--task quantize requires a checkpoint "
                         "(config key 'checkpoint' or --ckpt)")
    if frames_dir is None or out is None:
        raise SystemExit("--task quantize requires --frames DIR "
                         "(calibration imagery) and --out ARTIFACT")
    counter = VideoCounter.from_checkpoint(
        cfg.model["name"], cfg.checkpoint, log_para=cfg.log_para,
        quantize=True, calib_frames=_load_calib(frames_dir),
        **cfg.model.get("params", {}))
    save_quantized(counter.quantized, out, model_name=cfg.model["name"],
                   model_params=cfg.model.get("params", {}))
    n8 = sum("w8" in s for s in counter.quantized.qparams["sites"].values())
    print(f"[quantize] wrote {out}: {n8} int8 sites "
          f"(+{len(counter.quantized.qparams['sites']) - n8} fp)")


def _aot_export(cfg, shapes: str, platforms: str, out: str,
                quantize: bool = False, artifact: str = None,
                frames_dir: str = None, batch: int = 4):
    """`--task aot`: serialize the serving program itself (nn/aot.py).

    Exports one StableHLO program per --shapes entry (BxHxW, comma-
    separated) for the --platforms targets (e.g. "tpu,cpu" — a CPU
    build host can emit TPU programs). Source graph: the config's
    checkpoint, optionally --quantize'd, or a prebuilt int8 --artifact
    (then the AOT file is a self-contained int8 program). Replicas
    serve it with `--task serve --aot OUT` — no model code, no
    re-trace."""
    from dgvcc_tpu.nn.aot import export_serving, save_aot

    if out is None or shapes is None:
        raise SystemExit("--task aot requires --out FILE and --shapes "
                         "BxHxW[,BxHxW...] (e.g. --shapes 1x1080x1920,4x720x1280)")
    if quantize == "auto":
        raise SystemExit("--task aot exports ONE program per shape — "
                         "pick the precision: --quantize (int8) or "
                         "none (bf16); export both files to serve "
                         "adaptively")
    if artifact is None and cfg.checkpoint is None:
        raise SystemExit("--task aot requires a checkpoint (config key "
                         "'checkpoint' or --ckpt) or an int8 --artifact")
    try:
        parsed = [tuple(int(x) for x in tok.lower().split("x"))
                  for tok in shapes.split(",")]
        assert all(len(s) == 3 for s in parsed)
    except (ValueError, AssertionError):
        raise SystemExit(f"--shapes must be BxHxW[,BxHxW...], got {shapes!r}")
    plats = ([p.strip() for p in platforms.split(",") if p.strip()]
             if platforms else None)
    counter = _build_counter(cfg, quantize=quantize, artifact=artifact,
                             frames_dir=frames_dir, batch=batch)
    doc = export_serving(counter, parsed, platforms=plats)
    save_aot(doc, out)
    print(f"[aot] wrote {out}: {len(doc['programs'])} programs "
          f"{sorted(doc['programs'])} for platforms {doc['platforms']}"
          f"{' (int8)' if doc['quantized'] else ''}")


def _build_counter(cfg, quantize: bool = False, artifact: str = None,
                   frames_dir: str = None, batch: int = 4, aot: str = None):
    """One VideoCounter from the config: artifact deploy path, or
    checkpoint (+ optional int8 calibration on --frames imagery); a
    `mesh: {data: N}` config serves data-parallel. ``aot`` short-
    circuits everything: the serving program is already compiled-and-
    serialized (nn/aot.py), so no model build happens at all."""
    from dgvcc_tpu.serve import VideoCounter

    if aot is not None:
        from dgvcc_tpu.nn.aot import AotCounter

        if int((cfg.mesh or {}).get("data", 1)) > 1 or \
                int((cfg.mesh or {}).get("spatial", 1)) > 1:
            raise SystemExit(
                "--aot serves single-device programs; for data-parallel "
                "deployment run one replica process per chip, each "
                "loading the same AOT file")
        return AotCounter.load(aot)

    mesh = None
    dp = int((cfg.mesh or {}).get("data", 1))
    sp = int((cfg.mesh or {}).get("spatial", 1))
    # `serve_shard: spatial` slices each frame's HEIGHT over the mesh
    # (GSPMD halo-exchange convs) instead of the batch — the giant-
    # frame / batch=1 deployment regime (serve.py VideoCounter.shard).
    # The mesh size comes from either mesh key (spatial preferred).
    shard = cfg.extra.get("serve_shard", "batch")
    n_mesh = sp if (shard == "spatial" and sp > 1) else dp
    if shard == "spatial" and n_mesh <= 1:
        raise SystemExit(
            "serve_shard: spatial needs a mesh — set mesh: {spatial: N} "
            "(or mesh: {data: N}) in the config")
    if n_mesh > 1:
        # the frame batch (or, spatial, each frame's height) shards
        # over N chips (serve.py VideoCounter mesh path)
        import jax

        from dgvcc_tpu.parallel import make_mesh

        if n_mesh > len(jax.devices()):
            raise SystemExit(
                f"mesh {n_mesh} but only {len(jax.devices())} devices")
        mesh = make_mesh(n_mesh)
    if artifact is not None:
        if quantize == "auto":
            # an artifact carries ONLY the folded int8 graph — there are
            # no fp variables to fall back to at small batch, so serving
            # it as "auto" would silently pin every dispatch to int8
            # (mirrors VideoCounter's quantize='auto' + variables=None
            # guard)
            raise SystemExit(
                "--quantize auto cannot serve an --artifact: the int8 "
                "artifact has no fp weights for the small-batch path. "
                "Serve the checkpoint with --quantize auto, or the "
                "artifact without it")
        # prebuilt int8 artifact (--task quantize): skip checkpoint +
        # calibration entirely — the replica deploy path
        return VideoCounter.from_artifact(
            artifact, log_para=cfg.log_para, mesh=mesh, shard=shard)
    calib = None
    if quantize:
        if frames_dir is not None:
            calib = _load_calib(frames_dir, n=max(1, min(batch, 4)))
        elif quantize != "auto":
            # auto may calibrate lazily on the first throughput-regime
            # batch (it serves fp until then); plain int8 cannot
            raise SystemExit("--quantize without --artifact needs "
                             "--frames DIR for scale calibration")
    import jax.numpy as jnp

    # honor the config's activation dtype (trainer parity: bf16 default,
    # `compute_dtype: float32` for CPU/debug serving)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return VideoCounter.from_checkpoint(
        cfg.model["name"], cfg.checkpoint, log_para=cfg.log_para,
        quantize=quantize, calib_frames=calib, mesh=mesh, shard=shard,
        dtype=dtype,
        # default None = the shape-aware pixel rule (serve.py
        # AUTO_INT8_MIN_PIXELS); an int here opts this deployment into
        # the legacy per-chip-batch crossover instead
        auto_threshold=cfg.extra.get("auto_threshold"),
        **cfg.model.get("params", {}))


def _serve_http(cfg, port: int, quantize: bool = False,
                artifact: str = None, frames_dir: str = None,
                batch: int = 4, block: bool = True, aot: str = None):
    """`--task serve --http PORT`: network serving (serve_http.py) —
    POST /count with image bytes returns {"count": N}. ``--batch``
    bounds the request micro-batch (and the calibration frame count),
    matching its directory-mode meaning. ``block=False`` serves on a
    daemon thread and returns the server (tests, embedding)."""
    from dgvcc_tpu.serve_http import CountingServer

    counter = _build_counter(cfg, quantize=quantize, artifact=artifact,
                             frames_dir=frames_dir, batch=batch, aot=aot)
    srv = CountingServer(counter, host="0.0.0.0", port=port,
                         model_name=cfg.model["name"], max_batch=batch)
    if not block:
        srv.start()
        return srv
    srv.serve_forever()


def _serve(cfg, frames_dir: str, batch: int, quantize: bool = False,
           artifact: str = None, aot: str = None):
    """Stream per-frame crowd counts over a directory of images.

    Beyond-reference serving surface (the reference's closest analog is
    --task test/vis): decode on host, batch same-shape frames, pipeline
    through serve.VideoCounter so H2D of batch t+1 overlaps compute of
    t, print `name count` lines + a throughput summary.
    """
    import time

    import numpy as np
    from PIL import Image

    names = _list_images(frames_dir)
    counter = _build_counter(cfg, quantize=quantize, artifact=artifact,
                             frames_dir=frames_dir, batch=batch, aot=aot)

    def batches():
        """Consecutive same-shape frames batched together (mixed sizes
        flush the current batch — each shape bucket compiles once)."""
        buf, buf_names = [], []
        for n in names:
            img = np.asarray(Image.open(os.path.join(frames_dir, n))
                             .convert("RGB"), np.uint8)
            if buf and (img.shape != buf[-1].shape or len(buf) >= batch):
                yield buf_names, np.stack(buf)
                buf, buf_names = [], []
            buf.append(img)
            buf_names.append(n)
        if buf:
            yield buf_names, np.stack(buf)

    t0 = time.perf_counter()
    total = 0
    name_stream = []

    def frame_stream():
        for bn, frames in batches():
            name_stream.append(bn)
            yield frames

    for counts in counter.stream(frame_stream()):
        bn = name_stream.pop(0)
        for n, c in zip(bn, counts):
            print(f"{n} {float(c):.2f}")
        total += len(bn)
    dt = time.perf_counter() - t0
    print(f"[serve] {total} frames in {dt:.2f}s = {total / dt:.2f} fps")


def _export(trainer, cfg, template: str, out: str):
    """Write TPU-trained weights as a reference-loadable torch .pth.

    Inverse of the .pth migration path (--ckpt model.pth): the exported
    file strict-loads into the reference module
    (models/models.py, models/baselines/*, models/SW|ibnnet|ISW) — see
    nn/torch_export.py for how the inverse mapping is derived.
    """
    from dgvcc_tpu.nn.torch_export import (
        export_reference_checkpoint, save_reference_checkpoint)
    from dgvcc_tpu.nn.torch_io import load_torch_state_dict

    if cfg.checkpoint is None:
        raise SystemExit("--task export requires a checkpoint "
                         "(config key 'checkpoint' or --ckpt)")
    if template is None or out is None:
        raise SystemExit("--task export requires --template ref.pth "
                         "(a same-architecture reference state_dict, "
                         "for torch key names/shapes) and --out dest.pth")
    trainer.build()
    if getattr(trainer, "joint", False):
        # joint configs carry TWO models; export targets the counting
        # regressor (trainer.model), so a [gen_only] checkpoint would
        # export random-init regressor weights — refuse loudly
        if (isinstance(cfg.checkpoint, (list, tuple))
                and len(cfg.checkpoint) < 2):
            raise SystemExit(
                "--task export on a joint config needs the regressor "
                "checkpoint too: checkpoint: [gen.ckpt, reg.ckpt]. To "
                "export the generator, use a gen-family config.")
        print("[export] joint config: exporting the counting regressor "
              "(use a gen-family config to export the generator)")
    # strict: exporting weights that failed to load (wrong family, wrong
    # shapes — merged non-strictly they'd stay random-init) must be a
    # loud error, never a silently-garbage .pth
    trainer.load_ckpt(cfg.checkpoint, strict=True)
    sd = export_reference_checkpoint(
        trainer._variables(), load_torch_state_dict(template),
        trainer.model)
    save_reference_checkpoint(out, sd)
    print(f"[export] wrote {len(sd)} tensors to {out}")


def parse_ckpt_override(ckpt: str):
    """--ckpt value → `checkpoint:` config form. A comma pair means the
    joint-mode [gen, reg] list checkpoint (configs/stb_joint.yml style,
    reference dgtrainer.py:35-48) — lets scripts/launch.py --supervise
    resume joint runs from their last_gen.ckpt,last_reg.ckpt pair."""
    return ckpt.split(",") if "," in ckpt else ckpt


def run(config_path: str, task: str, frames: str = None, batch: int = 4,
        ckpt: str = None, quantize: bool = False, template: str = None,
        out: str = None, artifact: str = None, http: int = None,
        aot: str = None, shapes: str = None, platforms: str = None):
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg = load_config(config_path)
    # `compile_cache: true` (or a path) persists XLA compilations across
    # process restarts — serving replicas and repeated experiment runs
    # skip straight to cached programs (core/cache.py; a cache built on
    # different hardware is only ever a miss)
    cc = cfg.extra.get("compile_cache")
    if cc:
        from dgvcc_tpu.core.cache import enable_compile_cache

        enable_compile_cache(cc if isinstance(cc, str) else None)
    if ckpt is not None:
        # command-line override of the config's `checkpoint:` key
        # (resume/eval without editing the YAML; used by scripts/launch.py)
        cfg.checkpoint = parse_ckpt_override(ckpt)
    if task in ("serve", "quantize", "aot") and isinstance(
            cfg.checkpoint, (list, tuple)):
        # the [gen, reg] pair form is a trainer concept (joint mode);
        # letting it through would crash deep in from_checkpoint
        raise SystemExit(
            f"--task {task} takes a single checkpoint path; for a joint "
            "run pass the counting regressor's checkpoint (the _reg one)")
    # honor the config's device key (reference uses cuda:N; here 'cpu'
    # forces the CPU backend — useful for debugging — anything else uses
    # the default platform, i.e. the TPU)
    if str(cfg.device).startswith("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    trainer = DGTrainer(cfg)
    # snapshot the config into the log dir (main.py:151)
    os.makedirs(trainer.log_dir, exist_ok=True)
    shutil.copy(config_path, os.path.join(trainer.log_dir,
                                          os.path.basename(config_path)))

    if task == "train":
        trainer.train()
    elif task == "test":
        if cfg.checkpoint is None:
            raise SystemExit(
                "--task test requires a checkpoint (config key 'checkpoint') "
                "— evaluating random weights would report garbage metrics")
        trainer.build()
        trainer.load_ckpt(cfg.checkpoint)
        trainer.test()
    elif task == "vis":
        trainer.vis(checkpoint=cfg.checkpoint)
    elif task == "train_test":
        trainer.train_and_test()
    elif task == "generate":
        trainer.generate(checkpoint=cfg.checkpoint)
    elif task == "serve":
        if http is not None:
            _serve_http(cfg, http, quantize=quantize, artifact=artifact,
                        frames_dir=frames, batch=batch, aot=aot)
        else:
            if frames is None:
                raise SystemExit(
                    "--task serve requires --frames DIR (or --http PORT)")
            _serve(cfg, frames, batch, quantize=quantize, artifact=artifact,
                   aot=aot)
    elif task == "quantize":
        _quantize(cfg, frames, out)
    elif task == "aot":
        _aot_export(cfg, shapes, platforms, out, quantize=quantize,
                    artifact=artifact, frames_dir=frames, batch=batch)
    elif task == "export":
        _export(trainer, cfg, template, out)
    else:
        raise ValueError(f"Unknown task: {task}")


def build_parser():
    parser = argparse.ArgumentParser(description="dgvcc_tpu experiment runner")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--task", type=str, default="train",
                        choices=["train", "test", "vis", "train_test",
                                 "generate", "serve", "export", "quantize",
                                 "aot"])
    parser.add_argument("--frames", type=str, default=None,
                        help="image directory for --task serve")
    parser.add_argument("--batch", type=int, default=4,
                        help="serving batch size for --task serve "
                             "(HTTP mode: max request micro-batch)")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="override the config's checkpoint: key")
    parser.add_argument("--quantize", nargs="?", const=True, default=False,
                        choices=[True, False, "auto"], metavar="auto",
                        help="serve through the int8 PTQ graph (~1.5x "
                             "fps on TPU v5e at batch); '--quantize "
                             "auto' keeps both graphs and picks int8 "
                             "vs bf16 per dispatch by per-chip batch "
                             "(int8 wins >=8, bf16 wins at B=1)")
    parser.add_argument("--template", type=str, default=None,
                        help="--task export: a same-architecture "
                             "reference .pth for torch key names/shapes")
    parser.add_argument("--out", type=str, default=None,
                        help="--task export: destination .pth path; "
                             "--task quantize: destination artifact path")
    parser.add_argument("--artifact", type=str, default=None,
                        help="--task serve: a saved int8 artifact "
                             "(--task quantize output) — serves without "
                             "checkpoint or calibration")
    parser.add_argument("--http", type=int, default=None,
                        help="--task serve: listen on this port instead "
                             "of reading --frames (POST /count, GET "
                             "/healthz|/stats — serve_http.py)")
    parser.add_argument("--aot", type=str, default=None,
                        help="--task serve: a saved AOT program artifact "
                             "(--task aot output) — replays the serialized "
                             "StableHLO, no model code or re-trace")
    parser.add_argument("--shapes", type=str, default=None,
                        help="--task aot: frame shapes to export, "
                             "BxHxW[,BxHxW...] (e.g. 1x1080x1920,4x720x1280)")
    parser.add_argument("--platforms", type=str, default=None,
                        help="--task aot: lowering targets, e.g. 'tpu,cpu' "
                             "(default: this host's platform). A CPU host "
                             "can emit TPU programs.")
    return parser


def main():
    args = build_parser().parse_args()
    run(args.config, args.task, frames=args.frames, batch=args.batch,
        ckpt=args.ckpt, quantize=args.quantize, template=args.template,
        out=args.out, artifact=args.artifact, http=args.http,
        aot=args.aot, shapes=args.shapes, platforms=args.platforms)


if __name__ == "__main__":
    main()
