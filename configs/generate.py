"""Generate the experiment config zoo.

Mirrors the reference's 50 YAML configs (configs/, configs/ablation/,
configs/baselines/) with portable dataset roots (``data/{name}``; set
DGVCC_DATA_ROOT or edit the generated files to point elsewhere).
Checkpoint paths are null — the reference's configs referenced absolute
paths on the author's machine.

Run: python configs/generate.py
"""

from __future__ import annotations

import os

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.environ.get("DGVCC_DATA_ROOT", "data")


def dataset(root, name="den_cls", crop=320, downsample=1, **extra):
    params = {"root": f"{DATA}/{root}", "crop_size": crop,
              "downsample": downsample, "is_grey": False, "unit_size": 16,
              "pre_resize": 1}
    params.update(extra)
    return {"name": name, "params": params}


def base_config(version, train_root, test_root, mode="final", model=None,
                num_epochs=150, seed=2112, batch_size=16, patch_size=10000,
                loss=None, train_ds=None, test_ds=None, scheduler=None,
                lr=1e-3):
    train_ds = train_ds or dataset(train_root)
    test_ds = test_ds or dataset(test_root)
    return {
        "seed": seed,
        "version": version,
        "device": "tpu",
        "log_para": 1000,
        "patch_size": patch_size,
        "mode": mode,
        "num_epochs": num_epochs,
        "checkpoint": None,
        "model": model or {"name": "final", "params": {
            "pretrained": True, "mem_size": 1024, "mem_dim": 256,
            "cls_thrs": 0.5, "err_thrs": 0.5, "den_dropout": 0.5,
            "cls_dropout": 0.5, "has_err_loss": False}},
        "train_dataset": train_ds,
        "val_dataset": train_ds,
        "test_dataset": test_ds,
        "train_loader": {"batch_size": batch_size, "num_workers": 16,
                         "shuffle": True, "pin_memory": True},
        "val_loader": {"batch_size": 1, "num_workers": 4, "shuffle": False,
                       "pin_memory": False},
        "test_loader": {"batch_size": 1, "num_workers": 4, "shuffle": False,
                        "pin_memory": False},
        "loss": loss or {"name": "mse", "params": {"reduction": "mean"}},
        "optimizer": {"name": "adamw", "params": {"lr": lr, "weight_decay": 1e-4}},
        "scheduler": scheduler or {"name": "onecycle", "params": {
            "max_lr": lr, "epochs": num_epochs, "steps_per_epoch": 15,
            "final_div_factor": 1000}},
        "compute_dtype": "bfloat16",
    }


def emit(rel, cfg, comments=None):
    """``comments``: {top_level_key: text} — comment lines inserted
    above that key's line in the dumped YAML."""
    path = os.path.join(HERE, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    text = yaml.safe_dump(cfg, sort_keys=False)
    if comments:
        out = []
        for line in text.splitlines():
            key = line.split(":", 1)[0]
            if not line.startswith(" ") and key in comments:
                out += [f"# {c}" for c in comments[key].splitlines()]
            out.append(line)
        text = "\n".join(out) + "\n"
    with open(path, "w") as f:
        f.write(text)
    print("wrote", rel)


def dg_variant_model(name):
    params = {"pretrained": True, "den_dropout": 0.5}
    if name in ("mem", "memadd", "memcls", "final"):
        params.update(mem_size=1024, mem_dim=256)
    if name in ("cls", "memcls", "final"):
        params.update(cls_thrs=0.5, cls_dropout=0.5)
    if name in ("memadd", "final"):
        params.update(err_thrs=0.5)
    if name == "final":
        params.update(has_err_loss=False)
    return {"name": name, "params": params}


# per the reference ablation YAMLs (configs/ablation/sta_*.yml): mem
# trains two-view ('base'), memcls with the classifier objective ('cls')
VARIANT_MODE = {"base": "base", "simple": "simple", "mem": "base",
                "cls": "cls", "memcls": "cls", "memadd": "add",
                "final": "final", "nocon": "final"}
# reference patch sizes / dropouts per ablation variant
VARIANT_PATCH = {"mem": 10000, "memadd": 10000}
VARIANT_DROPOUT = {"base": 0.3, "simple": 0.3, "mem": 0.3, "cls": 0.3,
                   "memadd": 0.3, "memcls": 0.5, "nocon": 0.5}


def main():
    # ---- headline DG transfers ------------------------------------------
    emit("sta_final.yml", base_config("sta_final", "sta", "stb"))
    emit("stb_final.yml", base_config("stb_final", "stb", "sta"))
    emit("mall_final.yml", base_config("mall_final", "mall", "stb",
                                       num_epochs=60))
    emit("mall_base.yml", base_config(
        "mall_base", "mall", "stb", num_epochs=80, batch_size=8,
        model={"name": "dgnet", "params": {"pretrained": True}},
        mode="simple"))
    emit("qnrf_final.yml", base_config("qnrf_final", "qnrf", "stb",
                                       num_epochs=80))

    for a, b in (("fog", "snow"), ("snow", "fog"),
                 ("street", "stadium"), ("stadium", "street")):
        ds = lambda lbl: dataset("jhu", name="jhu_domain_cls",
                                 domain_label=f"jhu_{lbl}",
                                 domain_type="weather", domain=1)
        cfg = base_config(f"jhu_{a}2{b}", "jhu", "jhu", num_epochs=80,
                          patch_size=1440, train_ds=ds(a), test_ds=ds(b))
        # only fog2snow uses den_dropout 0.3 (jhu_fog2snow.yml:17);
        # the other transfers keep 0.5
        if (a, b) == ("fog", "snow"):
            cfg["model"]["params"]["den_dropout"] = 0.3
        emit(f"jhu_{a}2{b}.yml", cfg)

    # ---- generator / regressor experiments -------------------------------
    for dom in ("sta", "stb"):
        emit(f"{dom}_reg.yml", base_config(
            f"{dom}_reg_mem", dom, "stb" if dom == "sta" else "sta",
            mode="regression", num_epochs=80,
            model={"name": "reg_mem", "params": {"pretrained": True}}))
        emit(f"{dom}_reg_base.yml", base_config(
            f"{dom}_reg_base", dom, "stb" if dom == "sta" else "sta",
            mode="simple", num_epochs=100,
            model={"name": "dgnet", "params": {"pretrained": True}}))
        emit(f"{dom}_gen.yml", base_config(
            f"{dom}_gen", dom, "stb" if dom == "sta" else "sta",
            mode="generation", num_epochs=300,
            model={"name": "gen", "params": {}}))
        emit(f"{dom}_joint.yml", base_config(
            f"{dom}_joint", dom, "stb" if dom == "sta" else "sta",
            mode="joint", num_epochs=100,
            model={"name": "dgnet", "params": {"pretrained": True}}))
    emit("sta_dis.yml", base_config(
        "sta_dis", "sta", "stb", mode="discrimination", num_epochs=100,
        model={"name": "dgnet", "params": {"pretrained": True}}))

    # ---- ablations --------------------------------------------------------
    for dom in ("sta", "stb"):
        other = "stb" if dom == "sta" else "sta"
        for variant in ("base", "simple", "mem", "cls", "memcls", "memadd",
                        "nocon"):
            # 'simple' trains the plain DGModel_base with one view;
            # 'nocon' is the final model with the consistency loss ablated
            model_name = {"nocon": "final", "simple": "base"}.get(variant, variant)
            model = dg_variant_model(model_name)
            model["params"]["den_dropout"] = VARIANT_DROPOUT[variant]
            cfg = base_config(f"{dom}_{variant}", dom, other,
                              mode=VARIANT_MODE[variant], num_epochs=80,
                              patch_size=VARIANT_PATCH.get(variant, 1440),
                              model=model)
            if variant == "nocon":
                # consumed by the trainer: zeroes the consistency weight
                cfg["no_consistency"] = True
            emit(f"ablation/{dom}_{variant}.yml", cfg)

    # ---- DG baselines (SW / IBN / ISW) -------------------------------------
    def baseline_model(kind):
        if kind == "sw":
            return {"name": "sw", "params": {"pretrained": True}}
        if kind == "ibn":
            return {"name": "ibn", "params": {"pretrained": True}}
        return {"name": "isw", "params": {"relax_denom": 2.0, "clusters": 3}}

    for dom in ("sta", "stb"):
        other = "stb" if dom == "sta" else "sta"
        for kind in ("sw", "ibn", "isw"):
            # reference: sw/ibn train 80 epochs (seed 0), isw 120 (seed 1293)
            emit(f"baselines/{dom}_{kind}.yml", base_config(
                f"{dom}_{kind}", dom, other,
                num_epochs=120 if kind == "isw" else 80,
                seed=1293 if kind == "isw" else 0,
                mode="isw" if kind == "isw" else "simple",
                patch_size=1440, model=baseline_model(kind)))
    for a, b in (("fog", "snow"), ("snow", "fog"),
                 ("street", "stadium"), ("stadium", "street")):
        for kind in ("sw", "ibn", "isw"):
            ds = lambda lbl: dataset("jhu", name="jhu_domain_cls",
                                     domain_label=f"jhu_{lbl}",
                                     domain_type="weather", domain=1)
            emit(f"baselines/jhu_{a}2{b}_{kind}.yml", base_config(
                f"jhu_{a}2{b}_{kind}", "jhu", "jhu", num_epochs=80, seed=1293,
                mode="isw" if kind == "isw" else "simple", patch_size=1440,
                model=baseline_model(kind), train_ds=ds(a), test_ds=ds(b)))

    # ---- TPU showcase: large-crop memory recipe ----------------------------
    # remat (rematerialize encoder stages) + gradient accumulation:
    # 512^2 crops at effective batch 32 in the activation memory of
    # batch 8 — the knobs QUICKSTART section 3 documents.
    big = base_config("sta_final_bigcrop", "sta", "stb", num_epochs=80,
                      batch_size=8)
    big["train_dataset"]["params"]["crop_size"] = 512
    big["model"]["params"]["remat"] = True
    big["accum_steps"] = 4
    emit("tpu/sta_final_bigcrop.yml", big)

    # ---- TPU showcase: spatial partitioning --------------------------------
    # crops too large for ONE chip: the crop height shards over the
    # mesh (GSPMD halo-exchange convs, single-device numerics) —
    # parallel/spatial.py, QUICKSTART section 3. 1024^2 two-view crops
    # at batch 4 in 1/8th the per-chip activation memory.
    sp = base_config("sta_final_spatial", "sta", "stb", num_epochs=80,
                     batch_size=4)
    sp["train_dataset"]["params"]["crop_size"] = 1024
    sp["mesh"] = {"spatial": 8}
    emit("tpu/sta_final_spatial.yml", sp)

    # ---- classic counting baselines ----------------------------------------
    classic = {
        "csrnet": {"downsample": 8}, "mcnn": {"downsample": 4},
        "sasnet": {"downsample": 1}, "dssinet": {"downsample": 1},
        "cctrans": {"downsample": 8}, "bl": {"downsample": 8},
    }
    for name, opts in classic.items():
        if name == "bl":
            loss = {"name": "bl", "params": {
                "sigma": 8.0, "c_size": 320, "stride": 8,
                "background_ratio": 0.15, "use_background": True}}
            ds_train = dataset("sta", name="bay", crop=320)
            del ds_train["params"]["pre_resize"]
        else:
            loss = None
            ds_train = dataset("sta", name="den", crop=320,
                               downsample=opts["downsample"])
        cfg = base_config(
            f"sta_{name}", "sta", "stb", mode="simple", num_epochs=100,
            patch_size=1440, batch_size=8, loss=loss,
            model={"name": name, "params": {"pretrained": True}},
            train_ds=ds_train,
            test_ds=dataset("stb", name="den", crop=320,
                            downsample=opts["downsample"]))
        comments = None
        if name == "bl":
            cfg["log_para"] = 1
            comments = {"log_para": (
                "log_para 1 — the Bayesian loss trains raw count "
                "densities (no x1000\nscaling, unlike the MSE path: "
                "basetrainer.py:37 vs :44-45), while\npredict always "
                "divides by log_para (basetrainer.py:60-64). The\n"
                "reference ships no BL config; log_para must be 1 for "
                "BL counting to\nbe consistent.")}
        emit(f"baselines/sta_{name}.yml", cfg, comments=comments)


if __name__ == "__main__":
    main()
