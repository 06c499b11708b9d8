"""torch → flax weight conversion.

Quality parity with the reference depends on ImageNet-pretrained
torchvision backbones (DGModel loads VGG16-BN weights at construction,
reference models/models.py:35). This environment has no network access
and no cached weights, so conversion is exercised against synthetic
state dicts in tests; at deployment, point ``model.params.pretrained``
(or the checkpoint key) at a torchvision ``.pth`` and the same code
paths load it.

Layout rules:
  conv weight  OIHW → HWIO
  linear weight OI  → IO
  BN weight/bias → params scale/bias; running_mean/var → batch_stats
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from dgvcc_tpu.nn.vgg import feature_layout


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def conv_to_flax(w: np.ndarray) -> np.ndarray:
    """OIHW → HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def linear_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def vgg_features_to_flax(
    sd: Dict[str, np.ndarray],
    cfg,
    batch_norm: bool,
    start: int = 0,
    stop: int = 10_000,
    key_prefix: str = "features.",
) -> Tuple[Dict, Dict]:
    """torchvision VGG ``features.{i}.*`` keys → (params, batch_stats)
    with our conv{i}/bn{i} module names (nn/vgg.py uses torchvision
    feature indices as names, so this is a pure rename + transpose)."""
    params: Dict = {}
    stats: Dict = {}
    for kind, idx, _arg in feature_layout(cfg, batch_norm):
        if not (start <= idx < stop):
            continue
        if kind == "conv":
            params[f"conv{idx}"] = {
                "kernel": conv_to_flax(sd[f"{key_prefix}{idx}.weight"]),
                "bias": sd[f"{key_prefix}{idx}.bias"],
            }
        elif kind == "bn":
            params[f"bn{idx}"] = {
                "scale": sd[f"{key_prefix}{idx}.weight"],
                "bias": sd[f"{key_prefix}{idx}.bias"],
            }
            stats[f"bn{idx}"] = {
                "mean": sd[f"{key_prefix}{idx}.running_mean"],
                "var": sd[f"{key_prefix}{idx}.running_var"],
            }
    return params, stats


def graft(variables: Dict, module_path: Tuple[str, ...], params: Dict, stats: Dict) -> Dict:
    """Return a copy of ``variables`` with (params, stats) installed at
    the submodule path (e.g. ('enc1',))."""
    import copy

    out = {"params": copy.deepcopy(dict(variables["params"])),
           "batch_stats": copy.deepcopy(dict(variables.get("batch_stats", {})))}

    def _set(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for name, p in params.items():
        _set(out["params"], module_path + (name,), p)
    for name, s in stats.items():
        _set(out["batch_stats"], module_path + (name,), s)
    return out


def load_vgg16bn_into_dg(variables: Dict, sd: Dict[str, np.ndarray]) -> Dict:
    """Install torchvision vgg16_bn features into DGModel enc1/enc2/enc3
    (split points [:23],[23:33],[33:43] — reference models.py:36-38)."""
    from dgvcc_tpu.nn.vgg import VGG16_CFG

    for enc, (lo, hi) in (("enc1", (0, 23)), ("enc2", (23, 33)), ("enc3", (33, 43))):
        p, s = vgg_features_to_flax(sd, VGG16_CFG, True, lo, hi)
        variables = graft(variables, (enc,), p, s)
    return variables


def load_vgg16bn_into_unet(variables: Dict, sd: Dict[str, np.ndarray],
                           prefix: Tuple[str, ...] = ("fe",)) -> Dict:
    """Install vgg16_bn into the models2-style _VGGUNet (stage1/2/3 under
    ``prefix`` — models2.py:198-201)."""
    from dgvcc_tpu.nn.vgg import VGG16_CFG

    for st, (lo, hi) in (("stage1", (0, 23)), ("stage2", (23, 33)),
                         ("stage3", (33, 43))):
        p, s = vgg_features_to_flax(sd, VGG16_CFG, True, lo, hi)
        variables = graft(variables, prefix + (st,), p, s)
    return variables


def load_pretrained_backbone(variables: Dict, model_name: str,
                             weights: Dict[str, str]) -> Tuple[Dict, str]:
    """Best-effort pretrained-backbone install by registered model name.

    weights: {'vgg16_bn': path, ...} torchvision .pth files. Returns
    (variables, description). Models without a mapping return unchanged.
    """
    dg_family = {"base", "mem", "memadd", "cls", "memcls", "final"}
    unet_family = {"dgnet", "dgnet_cls", "reg", "reg_mem"}
    if model_name in dg_family and "vgg16_bn" in weights:
        sd = load_torch_state_dict(weights["vgg16_bn"])
        return load_vgg16bn_into_dg(variables, sd), "vgg16_bn → enc1/2/3"
    if model_name in unet_family and "vgg16_bn" in weights:
        sd = load_torch_state_dict(weights["vgg16_bn"])
        return load_vgg16bn_into_unet(variables, sd), "vgg16_bn → fe/stage1-3"
    if model_name == "sasnet" and "vgg16_bn" in weights:
        from dgvcc_tpu.nn.vgg import VGG16_CFG

        sd = load_torch_state_dict(weights["vgg16_bn"])
        splits = (("features1", (0, 6)), ("features2", (6, 13)),
                  ("features3", (13, 23)), ("features4", (23, 33)),
                  ("features5", (33, 43)))
        for name, (lo, hi) in splits:
            p, s = vgg_features_to_flax(sd, VGG16_CFG, True, lo, hi)
            variables = graft(variables, (name,), p, s)
        return variables, "vgg16_bn → features1-5"
    return variables, "no pretrained mapping"
