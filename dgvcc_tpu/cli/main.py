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


def run(config_path: str, task: str):
    from dgvcc_tpu.core.config import load_config
    from dgvcc_tpu.train.trainer import DGTrainer

    cfg = load_config(config_path)
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
    else:
        raise ValueError(f"Unknown task: {task}")


def main():
    parser = argparse.ArgumentParser(description="dgvcc_tpu experiment runner")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--task", type=str, default="train",
                        choices=["train", "test", "vis", "train_test",
                                 "generate"])
    args = parser.parse_args()
    run(args.config, args.task)


if __name__ == "__main__":
    main()
