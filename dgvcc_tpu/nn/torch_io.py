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

from typing import Dict, Optional, Tuple

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


def vgg_convs_in_order(sd: Dict[str, np.ndarray], cfg, batch_norm: bool = False,
                       key_prefix: str = "features.", max_convs: int = 10_000):
    """The conv (kernel, bias) pairs of a torchvision VGG state dict in
    feature order — for models that index convs by their own scheme
    rather than the torchvision feature index."""
    out = []
    for kind, idx, _arg in feature_layout(cfg, batch_norm):
        if kind == "conv" and len(out) < max_convs:
            out.append((conv_to_flax(sd[f"{key_prefix}{idx}.weight"]),
                        sd[f"{key_prefix}{idx}.bias"]))
    return out


def load_vgg19_into_bl(variables: Dict, sd: Dict[str, np.ndarray],
                       batch_norm: bool = False) -> Dict:
    """torchvision vgg19 (or vgg19_bn) features → BLVGG 'features'
    module (the reference loads the full feature stack strict=False,
    baselines/BL.py:52-55; module names are torchvision indices so this
    is a rename)."""
    from dgvcc_tpu.nn.vgg import VGG19_CFG

    p, s = vgg_features_to_flax(sd, VGG19_CFG, batch_norm)
    return graft(variables, ("features",), p, s)


def load_vgg19_into_generator(variables: Dict, sd: Dict[str, np.ndarray],
                              skip: bool = False) -> Dict:
    """torchvision vgg19 → Generator enc (features[:26], models2.py:31-33)
    or Generator0 enc1/enc2/enc3 (features[:9]/[9:18]/[18:26],
    models2.py:60-64)."""
    from dgvcc_tpu.nn.vgg import VGG19_CFG

    if skip:
        for enc, (lo, hi) in (("enc1", (0, 9)), ("enc2", (9, 18)),
                              ("enc3", (18, 26))):
            p, s = vgg_features_to_flax(sd, VGG19_CFG, False, lo, hi)
            variables = graft(variables, (enc,), p, s)
        return variables
    p, s = vgg_features_to_flax(sd, VGG19_CFG, False, 0, 26)
    return graft(variables, ("enc",), p, s)


def load_vgg19_into_sw_vgg(variables: Dict, sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision vgg19 → SWCounterVGG conv{i} sites.

    The reference remaps plain-vgg19 feature indices onto its
    SW-interleaved Sequential via idx_dict {0:0, 2:3, 5:7, ...}
    (models/SW/backbones/vgg.py:29-45): the k-th conv of torchvision
    vgg19 initializes the k-th conv of the SW stack, SW layers keep
    their init (strict=False). Our conv names are positions in
    VGG19_CFG[:-1] (models/whitening.py::SWCounterVGG), so the same
    k-th-conv correspondence applies.
    """
    from dgvcc_tpu.nn.vgg import VGG19_CFG

    convs = vgg_convs_in_order(sd, VGG19_CFG, batch_norm=False)
    params: Dict = {}
    k = 0
    for pos, v in enumerate(VGG19_CFG[:-1]):
        if v == "M":
            continue
        kernel, bias = convs[k]
        params[f"conv{pos}"] = {"kernel": kernel, "bias": bias}
        k += 1
    return graft(variables, (), params, {})


def load_vgg16_into_csrnet(variables: Dict, sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision vgg16 (plain) → CSRNet frontend conv0-9: the
    reference copies the first 10 convs positionally
    (baselines/CSRNet.py:21-28)."""
    from dgvcc_tpu.nn.vgg import VGG16_CFG

    convs = vgg_convs_in_order(sd, VGG16_CFG, batch_norm=False, max_convs=10)
    params = {f"conv{i}": {"kernel": w, "bias": b}
              for i, (w, b) in enumerate(convs)}
    return graft(variables, ("frontend",), params, {})


def load_vgg16_into_dssinet(variables: Dict, sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision vgg16 conv weights → DSSINet shared front-end stages
    (stage1: 2 convs, stage2: 2, stage3: 3, stage4: 3 — the cfg 'F'
    truncation, DSSINet.py:223,293). The reference ships the loader
    URL commented out (DSSINet.py:136-143) and trains from scratch;
    this mapping is the natural positional one (PReLU slopes keep
    their init)."""
    convs = iter(vgg_convs_in_order(
        sd, [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512],
        batch_norm=False))
    for stage, n in (("stage1", 2), ("stage2", 2), ("stage3", 3),
                     ("stage4", 3)):
        params = {}
        for i in range(n):
            w, b = next(convs)
            params[f"conv{i}"] = {"kernel": w, "bias": b}
        variables = graft(variables, (stage,), params, {})
    return variables


def resnet50_to_flax(sd: Dict[str, np.ndarray], num_stages: int = 3,
                     layers=(3, 4, 6, 3)) -> Tuple[Dict, Dict]:
    """torchvision resnet50 state dict → (params, batch_stats) matching
    nn/resnet.py::ResNetTrunk module names (conv1/bn1/layer{k}_{i}/...).

    Whitening-replaced norms (IN/IW/SW stem or post-norm sites) simply
    have no matching keys and keep their init — the same non-strict
    semantics as the reference's forgiving_state_restore / strict=False
    loads (ISW/mynn.py:64-80, SW/backbones/resnet.py:240).
    """
    params: Dict = {}
    stats: Dict = {}

    def bn(prefix):
        return (
            {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]},
        )

    params["conv1"] = {"kernel": conv_to_flax(sd["conv1.weight"])}
    if "bn1.weight" in sd:
        p, s = bn("bn1")
        params["bn1"] = p
        stats["bn1"] = s

    for k in range(num_stages):
        for i in range(layers[k]):
            name = f"layer{k + 1}_{i}"
            tp = f"layer{k + 1}.{i}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            for j in (1, 2, 3):
                blk_p[f"conv{j}"] = {"kernel": conv_to_flax(sd[f"{tp}.conv{j}.weight"])}
                p, s = bn(f"{tp}.bn{j}")
                blk_p[f"bn{j}"] = p
                blk_s[f"bn{j}"] = s
            if f"{tp}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": conv_to_flax(sd[f"{tp}.downsample.0.weight"])}
                p, s = bn(f"{tp}.downsample.1")
                blk_p["downsample_bn"] = p
                blk_s["downsample_bn"] = s
            params[name] = blk_p
            stats[name] = blk_s
    return params, stats


def densenet_to_flax(sd: Dict[str, np.ndarray], num_stages: int = 3
                     ) -> Tuple[Dict, Dict]:
    """torchvision densenet state dict → (params, batch_stats) matching
    nn/densenet.py::DenseNetTrunk names (conv0/norm0/denseblock{b}_
    denselayer{l}_{norm1,conv1,norm2,conv2}/transition{b}_{norm,conv}).

    SW/IBN-replaced norm1 sites have no matching shapes and keep their
    init — non-strict like the reference's strict=False densenet loads
    (SW/backbones/densenet.py:31, model_zoo strict=False).

    The published torchvision checkpoints (densenet121-a639ec97.pth
    et al.) use the LEGACY key format `denselayer1.norm.1.weight` /
    `conv.2.weight`; torchvision itself re-keys them at load time
    (torchvision densenet._load_state_dict's regex). Normalize the
    same way here so downloaded files convert as-is.
    """
    import re

    # torchvision's legacy re-key: '...denselayer1.norm.1.weight' →
    # '...denselayer1.norm1.weight' (concatenate the two groups)
    legacy = re.compile(
        r"^(.*denselayer\d+\.(?:norm|relu|conv))\.((?:[12])\."
        r"(?:weight|bias|running_mean|running_var))$")
    sd = {(m.group(1) + m.group(2) if (m := legacy.match(k)) else k): v
          for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    def bn(tp, name):
        params[name] = {"scale": sd[f"{tp}.weight"], "bias": sd[f"{tp}.bias"]}
        stats[name] = {"mean": sd[f"{tp}.running_mean"],
                       "var": sd[f"{tp}.running_var"]}

    params["conv0"] = {"kernel": conv_to_flax(sd["features.conv0.weight"])}
    if "features.norm0.weight" in sd:
        bn("features.norm0", "norm0")
    for b in range(num_stages):
        i = 0
        # block sizes inferred from the keys — one converter covers
        # densenet 121/169/201/161 and truncated test dicts alike
        while f"features.denseblock{b + 1}.denselayer{i + 1}.conv1.weight" in sd:
            tp = f"features.denseblock{b + 1}.denselayer{i + 1}"
            name = f"denseblock{b + 1}_denselayer{i + 1}"
            if f"{tp}.norm1.weight" in sd:
                bn(f"{tp}.norm1", f"{name}_norm1")
            params[f"{name}_conv1"] = {
                "kernel": conv_to_flax(sd[f"{tp}.conv1.weight"])}
            bn(f"{tp}.norm2", f"{name}_norm2")
            params[f"{name}_conv2"] = {
                "kernel": conv_to_flax(sd[f"{tp}.conv2.weight"])}
            i += 1
        if f"features.transition{b + 1}.norm.weight" in sd:
            # the truncated trunk reuses transition{num_stages}'s BN as
            # its final norm, so convert it even when its conv is cut
            bn(f"features.transition{b + 1}.norm", f"transition{b + 1}_norm")
            if b < num_stages - 1:
                params[f"transition{b + 1}_conv"] = {
                    "kernel": conv_to_flax(
                        sd[f"features.transition{b + 1}.conv.weight"])}
    if num_stages >= 4 and "features.norm5.weight" in sd:
        bn("features.norm5", "norm5")
    return params, stats


def altgvt_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Twins-ALTGVT (CCTrans backbone) torch state dict → flax params.

    Maps the reference's module names (models/baselines/CCTrans.py:
    patch_embeds.{k}, pos_block.{k}, blocks.{k}.{i} with GroupBlock
    norm1/attn/norm2/mlp) onto models/baselines/cctrans.py names
    (patch_embed{k}, pos_block{k}, block{k}_{i}). Only backbone keys are
    mapped — the Regression head trains from scratch like the
    reference's counting head.
    """
    params: Dict = {}

    def dense(prefix):
        return {"kernel": linear_to_flax(sd[f"{prefix}.weight"]),
                "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    k = 0
    while f"patch_embeds.{k}.proj.weight" in sd:
        params[f"patch_embed{k}"] = {
            "proj": {"kernel": conv_to_flax(sd[f"patch_embeds.{k}.proj.weight"]),
                     "bias": sd[f"patch_embeds.{k}.proj.bias"]},
            "norm": ln(f"patch_embeds.{k}.norm"),
        }
        if f"pos_block.{k}.proj.0.weight" in sd:
            w = sd[f"pos_block.{k}.proj.0.weight"]  # depthwise (C,1,3,3)
            params[f"pos_block{k}"] = {
                "proj": {"kernel": conv_to_flax(w),
                         "bias": sd[f"pos_block.{k}.proj.0.bias"]},
            }
        i = 0
        while f"blocks.{k}.{i}.norm1.weight" in sd:
            bp: Dict = {"norm1": ln(f"blocks.{k}.{i}.norm1"),
                        "norm2": ln(f"blocks.{k}.{i}.norm2"),
                        "mlp": {"fc1": dense(f"blocks.{k}.{i}.mlp.fc1"),
                                "fc2": dense(f"blocks.{k}.{i}.mlp.fc2")}}
            ap = f"blocks.{k}.{i}.attn"
            attn: Dict = {"proj": dense(f"{ap}.proj")}
            if f"{ap}.qkv.weight" in sd:  # window attention
                attn["qkv"] = dense(f"{ap}.qkv")
            else:  # global sub-sampled attention
                attn["q"] = dense(f"{ap}.q")
                attn["kv"] = dense(f"{ap}.kv")
                if f"{ap}.sr.weight" in sd:
                    attn["sr"] = {"kernel": conv_to_flax(sd[f"{ap}.sr.weight"]),
                                  "bias": sd[f"{ap}.sr.bias"]}
                    attn["norm"] = ln(f"{ap}.norm")
            bp["attn"] = attn
            params[f"block{k}_{i}"] = bp
            i += 1
        k += 1
    return params, {}


def _merge_into_backbone(variables: Dict, p: Dict, s: Dict) -> Dict:
    """Non-strict shape-checked merge of converted (params, stats) into
    the model's 'backbone' subtree (top-level or one level down, e.g.
    isw's params['net']['backbone'])."""
    import copy

    out = {"params": copy.deepcopy(dict(variables["params"])),
           "batch_stats": copy.deepcopy(dict(variables.get("batch_stats", {})))}

    def find_backbone(tree):
        if "backbone" in tree:
            return tree["backbone"]
        for v in tree.values():
            if isinstance(v, dict) and "backbone" in v:
                return v["backbone"]
        return {}

    def merge(dst, src):
        for k2, v2 in src.items():
            if k2 not in dst:
                continue
            if isinstance(v2, dict):
                merge(dst[k2], v2)
            elif np.shape(dst[k2]) == np.shape(v2):
                dst[k2] = v2

    merge(find_backbone(out["params"]), p)
    merge(find_backbone(out["batch_stats"]), s)
    return out


def load_pretrained_backbone(variables: Dict, model_name: str,
                             weights: Dict[str, str],
                             model_params: Optional[Dict] = None
                             ) -> Tuple[Dict, str]:
    """Best-effort pretrained-backbone install by registered model name.

    weights: {'vgg16_bn': path, ...} torchvision .pth files. Returns
    (variables, description). Models without a mapping return unchanged.
    model_params: the config's model params — consulted where the
    architecture flag changes the expected weights (bl's batch_norm).
    """
    dg_family = {"base", "mem", "memadd", "cls", "memcls", "final"}
    unet_family = {"dgnet", "dgnet_cls", "reg", "reg_mem"}
    if model_name in dg_family and "vgg16_bn" in weights:
        sd = load_torch_state_dict(weights["vgg16_bn"])
        return load_vgg16bn_into_dg(variables, sd), "vgg16_bn → enc1/2/3"
    if model_name in unet_family and "vgg16_bn" in weights:
        sd = load_torch_state_dict(weights["vgg16_bn"])
        return load_vgg16bn_into_unet(variables, sd), "vgg16_bn → fe/stage1-3"
    if model_name == "bl":
        # the converter layout MUST follow the model's batch_norm flag —
        # a plain-vgg19 dict grafted onto the BN layout (or vice versa)
        # lands only conv0 and leaves the rest at init, silently
        bn_model = bool((model_params or {}).get("batch_norm", False))
        key = "vgg19_bn" if bn_model else "vgg19"
        if key in weights:
            sd = load_torch_state_dict(weights[key])
            return (load_vgg19_into_bl(variables, sd, batch_norm=bn_model),
                    f"{key} → features")
        wrong = "vgg19" if bn_model else "vgg19_bn"
        if wrong in weights:
            return variables, (f"no pretrained mapping: bl(batch_norm="
                               f"{bn_model}) needs '{key}' weights but only "
                               f"'{wrong}' was provided")
    if model_name in ("gen", "gen0") and "vgg19" in weights:
        sd = load_torch_state_dict(weights["vgg19"])
        return (load_vgg19_into_generator(variables, sd,
                                          skip=model_name == "gen0"),
                "vgg19 → enc" + ("1-3" if model_name == "gen0" else ""))
    if model_name == "sw_vgg" and "vgg19" in weights:
        sd = load_torch_state_dict(weights["vgg19"])
        return load_vgg19_into_sw_vgg(variables, sd), \
            "vgg19 → conv sites (SW idx remap)"
    if model_name == "csrnet" and "vgg16" in weights:
        sd = load_torch_state_dict(weights["vgg16"])
        return load_vgg16_into_csrnet(variables, sd), "vgg16 → frontend"
    if model_name == "dssinet" and "vgg16" in weights:
        sd = load_torch_state_dict(weights["vgg16"])
        return load_vgg16_into_dssinet(variables, sd), "vgg16 → stage1-4"
    if model_name in ("sw", "ibn", "isw") and "resnet50" in weights:
        # graft into the counter's backbone; whitening-site norms keep
        # their init (non-strict, like the reference)
        sd = load_torch_state_dict(weights["resnet50"])
        p, s = resnet50_to_flax(sd, num_stages=3)
        # only install leaves that exist in the model (skip bn1 for
        # in/iw/sw stems etc.)
        out = _merge_into_backbone(variables, p, s)
        return out, "resnet50 → backbone (non-strict)"
    if model_name in ("sw_densenet", "ibn_densenet") and "densenet121" in weights:
        sd = load_torch_state_dict(weights["densenet121"])
        p, s = densenet_to_flax(sd, num_stages=3)
        out = _merge_into_backbone(variables, p, s)
        return out, "densenet121 → backbone (non-strict)"
    if model_name == "cctrans" and "alt_gvt" in weights:
        sd = load_torch_state_dict(weights["alt_gvt"])
        p, _ = altgvt_to_flax(sd)
        import copy

        out = {"params": copy.deepcopy(dict(variables["params"])),
               "batch_stats": copy.deepcopy(dict(variables.get("batch_stats", {})))}

        def merge(dst, src):
            for k2, v2 in src.items():
                if k2 not in dst:
                    continue
                if isinstance(v2, dict):
                    merge(dst[k2], v2)
                elif np.shape(dst[k2]) == np.shape(v2):
                    dst[k2] = v2

        merge(out["params"], p)
        return out, "alt_gvt → transformer backbone (non-strict)"
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


# ---------------------------------------------------------------------------
# Full trained-model migration: reference DGModel checkpoints → DGModel
# ---------------------------------------------------------------------------

def _convblock_to_flax(sd: Dict[str, np.ndarray], prefix: str
                       ) -> Tuple[Dict, Optional[Dict]]:
    """Reference ConvBlock (models.py:8-21: .conv / optional .bn) →
    flax ConvBlock (nn/layers.py: Conv_0 / BatchNorm_0)."""
    p: Dict = {"Conv_0": {"kernel": conv_to_flax(sd[f"{prefix}.conv.weight"])}}
    if f"{prefix}.conv.bias" in sd:
        p["Conv_0"]["bias"] = sd[f"{prefix}.conv.bias"]
    s = None
    if f"{prefix}.bn.weight" in sd:
        p["BatchNorm_0"] = {"scale": sd[f"{prefix}.bn.weight"],
                            "bias": sd[f"{prefix}.bn.bias"]}
        s = {"BatchNorm_0": {"mean": sd[f"{prefix}.bn.running_mean"],
                             "var": sd[f"{prefix}.bn.running_var"]}}
    return p, s


def dg_checkpoint_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Convert a TRAINED reference DGModel_{base,mem,memadd,cls,memcls,
    final} state_dict (models/models.py:29-335) to (params, batch_stats)
    for models/dg.py::DGModel — the checkpoint-migration path for users
    switching from the reference with trained weights.

    Key mapping:
      * enc{1,2,3}.{local}.*  — Sequential slices of vgg16_bn features;
        local indices re-base to torchvision feature indices (our
        conv{i}/bn{i} names);
      * dec{3,2,1}.{j}.*      → dec{3,2,1}_{j} ConvBlocks;
      * den_dec.0 / den_head.0 / cls_head.{0,2} → den_dec / den_head /
        cls_conv{1,2} (dropout/sigmoid carry no weights);
      * mem (1, K, S)         → memory/mem (K, S).
    """
    from dgvcc_tpu.nn.vgg import VGG16_CFG

    params: Dict = {}
    stats: Dict = {}
    for enc, lo, hi in (("enc1", 0, 23), ("enc2", 23, 33), ("enc3", 33, 43)):
        sub = {}
        pref = enc + "."
        for k, v in sd.items():
            if k.startswith(pref):
                loc, rest = k[len(pref):].split(".", 1)
                sub[f"{int(loc) + lo}.{rest}"] = v
        p, s = vgg_features_to_flax(sub, VGG16_CFG, True, lo, hi,
                                    key_prefix="")
        params[enc], stats[enc] = p, s

    for dec in ("dec3", "dec2", "dec1"):
        for j in (0, 1):
            p, s = _convblock_to_flax(sd, f"{dec}.{j}")
            params[f"{dec}_{j}"] = p
            if s:
                stats[f"{dec}_{j}"] = s

    p, s = _convblock_to_flax(sd, "den_dec.0")
    params["den_dec"] = p
    if s:
        stats["den_dec"] = s
    p, _ = _convblock_to_flax(sd, "den_head.0")
    params["den_head"] = p

    if "mem" in sd:
        params["memory"] = {"mem": np.asarray(sd["mem"])[0]}
    if "cls_head.0.conv.weight" in sd:
        p, s = _convblock_to_flax(sd, "cls_head.0")
        params["cls_conv1"] = p
        stats["cls_conv1"] = s
        p, _ = _convblock_to_flax(sd, "cls_head.2")
        params["cls_conv2"] = p
    return params, stats


def load_reference_dg_checkpoint(variables: Dict, sd: Dict[str, np.ndarray]
                                 ) -> Dict:
    """Install a trained reference DGModel checkpoint into an initialized
    DGModel's variables, with variant-mismatch checks (a checkpoint with
    a memory bank needs a use_mem model etc.)."""
    p, s = dg_checkpoint_to_flax(sd)
    have = set(variables["params"])
    want = set(p)
    if "memory" in want and "memory" not in have:
        raise ValueError("checkpoint has a memory bank (mem/memadd/memcls/"
                         "final) but the model was built without use_mem")
    if "cls_conv1" in want and "cls_conv1" not in have:
        raise ValueError("checkpoint has a classifier head (cls/memcls/"
                         "final) but the model was built without use_cls")
    missing = have - want
    if missing:
        raise ValueError(
            f"checkpoint is missing modules the model expects: "
            f"{sorted(missing)} — wrong variant? (model expects "
            f"{sorted(have)}, checkpoint provides {sorted(want)})")
    out = dict(variables)
    for name in want:
        out = graft(out, (name,), p[name], s.get(name, {}))
    return out


# reference Generator dec Sequential index ↔ our module name
# (models2.py:36-52: ConvBlocks at 0,1 | up | 3,4,5,6 | up | 8,9 | up
#  | 11, 12; Upsample/Tanh carry no weights)
_GEN_DEC_MAP = ((0, "dec0"), (1, "dec1"), (3, "dec2_0"), (4, "dec2_1"),
                (5, "dec2_2"), (6, "dec2_3"), (8, "dec3_0"), (9, "dec3_1"),
                (11, "dec4"), (12, "out"))


def generator_checkpoint_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Trained reference Generator (models2.py:29-56) → models/regressors
    Generator ('gen'): plain-VGG19[:26] encoder + tanh decoder."""
    from dgvcc_tpu.nn.vgg import VGG19_CFG

    params: Dict = {}
    stats: Dict = {}
    p, s = vgg_features_to_flax(sd, VGG19_CFG, False, 0, 26,
                                key_prefix="enc.")
    params["enc"], stats["enc"] = p, s
    for idx, name in _GEN_DEC_MAP:
        p, s = _convblock_to_flax(sd, f"dec.{idx}")
        params[name] = p
        if s:
            stats[name] = s
    return params, stats


def regressor_m_checkpoint_to_flax(sd: Dict[str, np.ndarray]
                                   ) -> Tuple[Dict, Dict]:
    """Trained reference DensityRegressorM (models2.py:189-373) →
    models/regressors.DensityRegressorM ('reg_mem'): VGG16-BN U-Net
    under 'fe', memory bank, den/cls heads."""
    from dgvcc_tpu.nn.vgg import VGG16_CFG

    params: Dict = {"fe": {}}
    stats: Dict = {"fe": {}}
    for st, lo, hi in (("stage1", 0, 23), ("stage2", 23, 33),
                       ("stage3", 33, 43)):
        sub = {}
        pref = st + "."
        for k, v in sd.items():
            if k.startswith(pref):
                loc, rest = k[len(pref):].split(".", 1)
                sub[f"{int(loc) + lo}.{rest}"] = v
        p, s = vgg_features_to_flax(sub, VGG16_CFG, True, lo, hi,
                                    key_prefix="")
        params["fe"][st], stats["fe"][st] = p, s
    for dec in ("dec3", "dec2", "dec1"):
        for j in (0, 1):
            p, s = _convblock_to_flax(sd, f"{dec}.{j}")
            params["fe"][f"{dec}_{j}"] = p
            if s:
                stats["fe"][f"{dec}_{j}"] = s
    p, s = _convblock_to_flax(sd, "den_dec.0")
    params["den_dec"] = p
    if s:
        stats["den_dec"] = s
    p, _ = _convblock_to_flax(sd, "den_head")  # direct ConvBlock, no Sequential
    params["den_head"] = p
    params["memory"] = {"mem": np.asarray(sd["mem"])[0]}
    p, s = _convblock_to_flax(sd, "cls_head.0")
    params["cls_conv1"] = p
    stats["cls_conv1"] = s
    p, _ = _convblock_to_flax(sd, "cls_head.2")
    params["cls_conv2"] = p
    return params, stats


def load_reference_checkpoint(variables: Dict, sd: Dict[str, np.ndarray],
                              model) -> Dict:
    """Dispatch trained reference-checkpoint conversion by model type.

    Covers the model families the reference ships trained checkpoints
    for in its configs: the DGModel family ('base'..'final'), the
    models2 Generator ('gen') and DensityRegressorM ('reg_mem', mode
    regression/joint). Raises with the supported list otherwise.
    """
    from dgvcc_tpu.models.baselines.bl_vgg import BLVGG
    from dgvcc_tpu.models.baselines.cctrans import ALTGVT
    from dgvcc_tpu.models.baselines.csrnet import CSRNet
    from dgvcc_tpu.models.baselines.dssinet import DSSINet
    from dgvcc_tpu.models.baselines.mcnn import MCNN
    from dgvcc_tpu.models.baselines.sasnet import SASNet
    from dgvcc_tpu.models.dg import DGModel
    from dgvcc_tpu.models.regressors import DensityRegressorM, Generator
    from dgvcc_tpu.models.whitening import (
        IBNCounterResNet, ISWCounterResNet, SWCounterResNet, SWCounterVGG)
    from dgvcc_tpu.nn.resnet import RESNET_LAYERS

    try:
        if isinstance(model, DGModel):
            return load_reference_dg_checkpoint(variables, sd)
        if isinstance(model, Generator):
            p, s = generator_checkpoint_to_flax(sd)
        elif isinstance(model, DensityRegressorM):
            p, s = regressor_m_checkpoint_to_flax(sd)
        elif isinstance(model, CSRNet):
            p, s = csrnet_checkpoint_to_flax(sd)
        elif isinstance(model, MCNN):
            p, s = mcnn_checkpoint_to_flax(sd)
        elif isinstance(model, BLVGG):
            p, s = bl_checkpoint_to_flax(sd, batch_norm=model.batch_norm)
        elif isinstance(model, SWCounterVGG):
            p, s = sw_vgg_checkpoint_to_flax(sd)
        elif isinstance(model, SWCounterResNet):
            p, s = sw_counter_checkpoint_to_flax(
                sd,
                layers=tuple(model.layers or RESNET_LAYERS[model.depth])[:3])
        elif isinstance(model, IBNCounterResNet):
            p, s = ibn_counter_checkpoint_to_flax(
                sd,
                layers=tuple(model.layers or RESNET_LAYERS[model.depth])[:3])
        elif isinstance(model, ISWCounterResNet):
            p, s = isw_counter_checkpoint_to_flax(
                sd, layers=tuple(model.layers)[:3])
        elif isinstance(model, SASNet):
            p, s = sasnet_checkpoint_to_flax(sd)
        elif isinstance(model, ALTGVT):
            p, s = cctrans_checkpoint_to_flax(sd)
        elif isinstance(model, DSSINet):
            p, s = dssinet_checkpoint_to_flax(sd)
        else:
            raise ValueError(
                ".pth checkpoint conversion supports every reference "
                "model family: the DG variants, 'gen', 'reg_mem', "
                "'csrnet', 'mcnn', 'bl', 'sw', 'ibn', 'isw', 'sasnet', "
                f"'cctrans', 'dssinet'; got {type(model).__name__}")
    except KeyError as e:
        raise ValueError(
            f"checkpoint does not match a {type(model).__name__} state "
            f"dict: missing key {e} — wrong model family for this .pth?"
        ) from e
    have = set(variables["params"])
    missing = have - set(p)
    if missing:
        raise ValueError(f"checkpoint is missing modules the model "
                         f"expects: {sorted(missing)}")
    out = dict(variables)
    for name in p:
        out = graft(out, (name,), p[name], s.get(name, {}))
    return out


# ---------------------------------------------------------------------------
# Classic-baseline trained checkpoints
# ---------------------------------------------------------------------------

def _plain_stack_to_flax(sd: Dict[str, np.ndarray], prefix: str, cfg
                         ) -> Dict:
    """A make_layers-style Sequential (conv+ReLU per entry, 'M' pools) →
    our _ConvStack conv{k} names (k counts convs only)."""
    params: Dict = {}
    seq = 0
    k = 0
    for v in cfg:
        if v == "M":
            seq += 1
            continue
        entry = {"kernel": conv_to_flax(sd[f"{prefix}.{seq}.weight"])}
        if f"{prefix}.{seq}.bias" in sd:
            entry["bias"] = sd[f"{prefix}.{seq}.bias"]
        params[f"conv{k}"] = entry
        seq += 2  # conv + ReLU
        k += 1
    return params


def csrnet_checkpoint_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Trained reference CSRNet (baselines/CSRNet.py:10-44) →
    models/baselines/csrnet.py (frontend/backend _ConvStacks)."""
    from dgvcc_tpu.models.baselines.csrnet import BACKEND, FRONTEND

    params = {
        "frontend": _plain_stack_to_flax(sd, "frontend", FRONTEND),
        "backend": _plain_stack_to_flax(sd, "backend", BACKEND),
        "output_layer": {"kernel": conv_to_flax(sd["output_layer.weight"]),
                         "bias": sd["output_layer.bias"]},
    }
    return params, {}


def mcnn_checkpoint_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Trained reference MCNN (baselines/MCNN.py:7-75): branch Sequential
    conv positions 0/3/6/8 → our branch{n}/conv{0..3}; fuse.0 → fuse."""
    params: Dict = {}
    for b in ("branch1", "branch2", "branch3"):
        params[b] = {}
        for k, seq in enumerate((0, 3, 6, 8)):
            params[b][f"conv{k}"] = {
                "kernel": conv_to_flax(sd[f"{b}.{seq}.weight"]),
                "bias": sd[f"{b}.{seq}.bias"],
            }
    params["fuse"] = {"kernel": conv_to_flax(sd["fuse.0.weight"]),
                      "bias": sd["fuse.0.bias"]}
    return params, {}


def bl_checkpoint_to_flax(sd: Dict[str, np.ndarray], batch_norm: bool = False
                          ) -> Tuple[Dict, Dict]:
    """Trained reference BL-VGG (baselines/BL.py:11-56): torchvision-
    indexed features + reg_layer.{0,2,4} → features/conv{i}, reg{1,2,3}."""
    from dgvcc_tpu.nn.vgg import VGG19_CFG

    p, s = vgg_features_to_flax(sd, VGG19_CFG, batch_norm)
    params: Dict = {"features": p}
    stats: Dict = {"features": s} if s else {}
    for our, seq in (("reg1", 0), ("reg2", 2), ("reg3", 4)):
        params[our] = {"kernel": conv_to_flax(sd[f"reg_layer.{seq}.weight"]),
                       "bias": sd[f"reg_layer.{seq}.bias"]}
    return params, stats


# ---------------------------------------------------------------------------
# Whitening-counter trained checkpoints (SW / IBN / ISW)
# ---------------------------------------------------------------------------

def _bn_site(sd: Dict[str, np.ndarray], pref: str) -> Tuple[Dict, Dict]:
    return ({"scale": sd[f"{pref}.weight"], "bias": sd[f"{pref}.bias"]},
            {"mean": sd[f"{pref}.running_mean"],
             "var": sd[f"{pref}.running_var"]})


def _sw_site(sd: Dict[str, np.ndarray], pref: str) -> Tuple[Dict, Dict]:
    """SwitchWhiten params/buffers carry the reference's own names
    (SW/ops/switchwhiten.py:47-63 = nn/whitening.py) — verbatim copy."""
    p = {"sw_mean_weight": sd[f"{pref}.sw_mean_weight"],
         "weight": sd[f"{pref}.weight"], "bias": sd[f"{pref}.bias"]}
    if f"{pref}.sw_var_weight" in sd:
        p["sw_var_weight"] = sd[f"{pref}.sw_var_weight"]
    s = {"running_mean": np.asarray(sd[f"{pref}.running_mean"], np.float32),
         "running_cov": np.asarray(sd[f"{pref}.running_cov"], np.float32)}
    return p, s


def sw_vgg_checkpoint_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Trained reference SWCounter_VGG (SW/__init__.py:12-22) → our
    models/whitening.py::SWCounterVGG.

    The SW vgg features Sequential is conv/SW/relu per cfg-'E' entry
    plus pools (SW/backbones/vgg.py:64-77, cfg without a trailing pool);
    our conv{pos}/sw{pos} names index cfg positions. reg head at
    vgg.reg_layer.{0,2,4} (vgg.py:20-26)."""
    from dgvcc_tpu.nn.vgg import VGG19_CFG

    params: Dict = {}
    stats: Dict = {}
    ti = 0  # torch Sequential index inside vgg.features
    for pos, v in enumerate(VGG19_CFG[:-1]):
        if v == "M":
            ti += 1
            continue
        pre = f"vgg.features.{ti}"
        params[f"conv{pos}"] = {"kernel": conv_to_flax(sd[f"{pre}.weight"]),
                                "bias": sd[f"{pre}.bias"]}
        p, s = _sw_site(sd, f"vgg.features.{ti + 1}")
        params[f"sw{pos}"], stats[f"sw{pos}"] = p, s
        ti += 3
    for name, i in (("reg1", 0), ("reg2", 2), ("reg3", 4)):
        pre = f"vgg.reg_layer.{i}"
        params[name] = {"kernel": conv_to_flax(sd[f"{pre}.weight"]),
                        "bias": sd[f"{pre}.bias"]}
    return params, stats


def _bottleneck_to_flax(sd: Dict[str, np.ndarray], pref: str,
                        sw2: bool = False, post_in: bool = False
                        ) -> Tuple[Dict, Dict]:
    """One torch Bottleneck → our nn/resnet.py Bottleneck names."""
    p: Dict = {}
    s: Dict = {}
    for j in (1, 2, 3):
        p[f"conv{j}"] = {"kernel": conv_to_flax(sd[f"{pref}.conv{j}.weight"])}
        if sw2 and j == 2:  # build_norm_layer names the SW site 'sw2'
            p["bn2"], s["bn2"] = _sw_site(sd, f"{pref}.sw2")
        else:
            p[f"bn{j}"], s[f"bn{j}"] = _bn_site(sd, f"{pref}.bn{j}")
    if f"{pref}.downsample.0.weight" in sd:
        p["downsample_conv"] = {
            "kernel": conv_to_flax(sd[f"{pref}.downsample.0.weight"])}
        p["downsample_bn"], s["downsample_bn"] = _bn_site(
            sd, f"{pref}.downsample.1")
    if post_in and f"{pref}.IN.weight" in sd:
        # post-residual IN(affine) — resnet_ibn.py:80,103-104
        p["post_in"] = {"scale": sd[f"{pref}.IN.weight"],
                        "bias": sd[f"{pref}.IN.bias"]}
    return p, s


def _counting_head_to_flax(sd: Dict[str, np.ndarray], prefix: str = "head"
                           ) -> Dict:
    """3-conv head Sequential (convs at 0/2/4) → head/conv{1,2,3}."""
    return {f"conv{k}": {"kernel": conv_to_flax(sd[f"{prefix}.{seq}.weight"]),
                         "bias": sd[f"{prefix}.{seq}.bias"]}
            for k, seq in ((1, 0), (2, 2), (3, 4))}


def sw_counter_checkpoint_to_flax(sd: Dict[str, np.ndarray],
                                  layers=(3, 4, 6)) -> Tuple[Dict, Dict]:
    """Trained reference SWCounter_ResNet (SW/__init__.py:24-42):
    backbone Sequential children[:7] (0=conv1, 1=SW stem 'sw1',
    4..6=layer1..3 with SW as norm2 of odd non-first blocks,
    SW/backbones/resnet.py:204-210) + 3-conv head."""
    params: Dict = {"backbone": {}, "head": _counting_head_to_flax(sd)}
    stats: Dict = {"backbone": {}}
    params["backbone"]["conv1"] = {
        "kernel": conv_to_flax(sd["backbone.0.weight"])}
    params["backbone"]["bn1"], stats["backbone"]["bn1"] = _sw_site(
        sd, "backbone.1")
    for k, n in enumerate(layers):
        for i in range(n):
            sw2 = i != 0 and i % 2 == 1
            p, s = _bottleneck_to_flax(sd, f"backbone.{4 + k}.{i}", sw2=sw2)
            params["backbone"][f"layer{k + 1}_{i}"] = p
            stats["backbone"][f"layer{k + 1}_{i}"] = s
    return params, stats


def ibn_counter_checkpoint_to_flax(sd: Dict[str, np.ndarray],
                                   layers=(3, 4, 6)) -> Tuple[Dict, Dict]:
    """Trained reference IBNCounter_ResNet (ibnnet/__init__.py:11-28):
    resnet50_ibn_b children[:7] — IN(affine) stem (resnet_ibn.py:122),
    post-residual IN in the LAST block of stages 1-2
    (resnet_ibn.py:153-158) — + 3-conv head."""
    params: Dict = {"backbone": {}, "head": _counting_head_to_flax(sd)}
    stats: Dict = {"backbone": {}}
    params["backbone"]["conv1"] = {
        "kernel": conv_to_flax(sd["backbone.0.weight"])}
    # stem InstanceNorm2d(affine=True): weight/bias only, no running stats
    params["backbone"]["bn1"] = {"scale": sd["backbone.1.weight"],
                                 "bias": sd["backbone.1.bias"]}
    for k, n in enumerate(layers):
        for i in range(n):
            post = k < 2 and i == n - 1
            p, s = _bottleneck_to_flax(sd, f"backbone.{4 + k}.{i}",
                                       post_in=post)
            params["backbone"][f"layer{k + 1}_{i}"] = p
            stats["backbone"][f"layer{k + 1}_{i}"] = s
    return params, stats


def isw_counter_checkpoint_to_flax(sd: Dict[str, np.ndarray],
                                   layers=(3, 4, 6)) -> Tuple[Dict, Dict]:
    """Trained reference ISWCounter_ResNet (ISW/__init__.py:21-122):
    layer0 = Sequential(conv1, IW, relu, maxpool) — the IW sites
    (wt_layer codes 2) are affine-free InstanceNorms with NO params
    (ISW/instance_whitening.py) — layer1..3 plain bottlenecks, 3-conv
    head. layer4 exists in the checkpoint but is unused (forward stops
    at layer3); its keys are ignored. Everything lands under 'net'
    (models/whitening.py::_ISWNet)."""
    bb: Dict = {"conv1": {"kernel": conv_to_flax(sd["layer0.0.weight"])}}
    sbb: Dict = {}
    for k, n in enumerate(layers):
        for i in range(n):
            p, s = _bottleneck_to_flax(sd, f"layer{k + 1}.{i}")
            bb[f"layer{k + 1}_{i}"] = p
            sbb[f"layer{k + 1}_{i}"] = s
    params = {"net": {"backbone": bb, "head": _counting_head_to_flax(sd)}}
    stats = {"net": {"backbone": sbb}}
    return params, stats


def sasnet_checkpoint_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Trained reference SASNet (baselines/SASNet.py:47-214) → our
    models/baselines/sasnet.py auto-named modules.

    Order contracts (deterministic on both sides):
      * de_pred5..de_pred1, two convs each → ConvRelu_0..ConvRelu_9;
      * per scale i (5..1): density_head{n}.0 MultiBranchModule (branch
        call order 1x1, 1x1_1, 3x3_1, 3x3_2, 3x3dbl_1, 3x3dbl_2) →
        MultiBranch_{i}/BasicConv_{0..5}; density_head{n}.1 → Conv_{i};
        confidence_head{n}.{0,1} → ConvRelu_{10+2i}, ConvRelu_{11+2i};
      * features1..5 are vgg16_bn Sequential slices with local indices.
    """
    from dgvcc_tpu.nn.vgg import VGG16_CFG

    params: Dict = {}
    stats: Dict = {}
    splits = (("features1", 0, 6), ("features2", 6, 13),
              ("features3", 13, 23), ("features4", 23, 33),
              ("features5", 33, 43))
    for st, lo, hi in splits:
        sub = {}
        pref = st + "."
        for k, v in sd.items():
            if k.startswith(pref):
                loc, rest = k[len(pref):].split(".", 1)
                sub[f"{int(loc) + lo}.{rest}"] = v
        p, s = vgg_features_to_flax(sub, VGG16_CFG, True, lo, hi,
                                    key_prefix="")
        params[st], stats[st] = p, s

    def plain_conv(pref):
        out = {"kernel": conv_to_flax(sd[f"{pref}.weight"])}
        if f"{pref}.bias" in sd:
            out["bias"] = sd[f"{pref}.bias"]
        return out

    cr = 0
    for n in (5, 4, 3, 2, 1):
        for j in (0, 1):
            params[f"ConvRelu_{cr}"] = {"Conv_0": plain_conv(f"de_pred{n}.{j}.conv")}
            cr += 1

    branches = ("branch1x1", "branch1x1_1", "branch3x3_1", "branch3x3_2",
                "branch3x3dbl_1", "branch3x3dbl_2")
    for i, n in enumerate((5, 4, 3, 2, 1)):
        mb_p: Dict = {}
        mb_s: Dict = {}
        for b, br in enumerate(branches):
            pref = f"density_head{n}.0.{br}"
            mb_p[f"BasicConv_{b}"] = {
                "Conv_0": {"kernel": conv_to_flax(sd[f"{pref}.conv.weight"])},
                "BatchNorm_0": {"scale": sd[f"{pref}.bn.weight"],
                                "bias": sd[f"{pref}.bn.bias"]},
            }
            mb_s[f"BasicConv_{b}"] = {"BatchNorm_0": {
                "mean": sd[f"{pref}.bn.running_mean"],
                "var": sd[f"{pref}.bn.running_var"]}}
        params[f"MultiBranch_{i}"] = mb_p
        stats[f"MultiBranch_{i}"] = mb_s
        params[f"Conv_{i}"] = plain_conv(f"density_head{n}.1.conv")
        params[f"ConvRelu_{10 + 2 * i}"] = {
            "Conv_0": plain_conv(f"confidence_head{n}.0.conv")}
        params[f"ConvRelu_{11 + 2 * i}"] = {
            "Conv_0": plain_conv(f"confidence_head{n}.1.conv")}
    return params, stats


# reference Regression head conv/bn Sequential indices → our names
# (CCTrans.py:16-61; v2/v3 lead with a weightless Upsample)
_CCTRANS_REG_MAP = (("v1", 0), ("v2", 1), ("v3", 1), ("stage1", 0),
                    ("stage2", 0), ("stage3", 0), ("stage4", 0))


def cctrans_checkpoint_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Trained reference CCTrans / alt_gvt_base (CCTrans.py:426,485-540):
    Twins backbone via altgvt_to_flax + the Regression head
    (regression.{v1,v2,v3,stage1..4,res}); the unused ImageNet
    classifier (norm/head) is ignored."""
    params, _ = altgvt_to_flax(sd)
    reg_p: Dict = {}
    reg_s: Dict = {}
    for name, ci in _CCTRANS_REG_MAP:
        pref = f"regression.{name}"
        reg_p[f"{name}_conv"] = {
            "kernel": conv_to_flax(sd[f"{pref}.{ci}.weight"]),
            "bias": sd[f"{pref}.{ci}.bias"]}
        reg_p[f"{name}_bn"] = {"scale": sd[f"{pref}.{ci + 1}.weight"],
                               "bias": sd[f"{pref}.{ci + 1}.bias"]}
        reg_s[f"{name}_bn"] = {"mean": sd[f"{pref}.{ci + 1}.running_mean"],
                               "var": sd[f"{pref}.{ci + 1}.running_var"]}
    reg_p["res1_conv"] = {"kernel": conv_to_flax(sd["regression.res.0.weight"]),
                          "bias": sd["regression.res.0.bias"]}
    reg_p["res1_bn"] = {"scale": sd["regression.res.1.weight"],
                        "bias": sd["regression.res.1.bias"]}
    reg_s["res1_bn"] = {"mean": sd["regression.res.1.running_mean"],
                        "var": sd["regression.res.1.running_var"]}
    reg_p["res2"] = {"kernel": conv_to_flax(sd["regression.res.3.weight"]),
                     "bias": sd["regression.res.3.bias"]}
    params["regression"] = reg_p
    return params, {"regression": reg_s}


# DSSINet front_end.features conv/prelu names per stage (make_layers
# naming, DSSINet.py:176-219, cfg 'F'): conv indices / PReLU 'relu{i}'
_DSSI_STAGES = (
    ("stage1", ("0", "2"), ("relu1",)),
    ("stage2", ("5", "7"), ("relu6",)),
    ("stage3", ("10", "12", "14"), ("relu11", "relu13")),
    ("stage4", ("17", "19", "21"), ("relu18", "relu20")),
)


def dssinet_checkpoint_to_flax(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Trained reference DSSINet/CRFVGG (DSSINet.py:285-417) → our
    models/baselines/dssinet.py.

    Stage convs keep the make_layers indices; the stage-final PReLUs
    map to the sites the reference forward actually crosses (relu3 →
    stage1_act in the scale1 chain, relu22 → stage4_act; relu8/relu15
    are dead in the reference forward and are skipped). The shared
    output PReLU and the per-passing PReLUs copy directly.
    """
    fe = "front_end.features"
    params: Dict = {}

    def conv(pref):
        out = {"kernel": conv_to_flax(sd[f"{pref}.weight"])}
        if f"{pref}.bias" in sd:
            out["bias"] = sd[f"{pref}.bias"]
        return out

    def alpha(pref):
        return {"alpha": np.asarray(sd[f"{pref}.weight"]).reshape(1)}

    for st, convs, prelus in _DSSI_STAGES:
        p: Dict = {}
        for i, idx in enumerate(convs):
            p[f"conv{i}"] = conv(f"{fe}.{idx}")
        for i, name in enumerate(prelus):
            p[f"prelu{i}"] = alpha(f"{fe}.{name}")
        params[st] = p
    params["stage1_act"] = alpha(f"{fe}.relu3")
    params["stage4_act"] = alpha(f"{fe}.relu22")

    for k, n in ((1, 2), (2, 3), (3, 3), (4, 2)):
        p = {"prelu": alpha(f"passing{k}.prelu")}
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                # Sequential index 0 is the reference's Conv2d wrapper
                # module (DSSINet.py:37-60) → '.0.conv.weight'
                p[f"w_0_{j}_{i}_0"] = conv(f"passing{k}.w_0_{j}_{i}_0.0.conv")
        params[f"passing{k}"] = p

    for k in range(1, 6):
        params[f"decoder{k}"] = {"c1": conv(f"decoder{k}.0.conv"),
                                 "c2": conv(f"decoder{k}.1.conv")}
    for k in range(1, 5):
        params[f"pw{k}"] = conv(f"passing_weight{k}.conv")
    params["out_prelu"] = alpha("prelu")
    return params, {}
