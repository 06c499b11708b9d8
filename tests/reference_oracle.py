"""Import the actual ``/root/reference`` torch modules as parity oracles.

The container lacks torchvision / timm / kmeans1d; the reference only
uses them for (a) pretrained-weight download, (b) the standard
torchvision VGG graph, (c) small ViT utility layers, (d) 1-D k-means.
We install minimal faithful shims for those four surfaces so the
reference's *own* model code runs unmodified as a numeric golden.

The shims never download anything: every ``load_url``-style entry point
is patched to return weights that keep construction working (an empty
dict for strict=False sites; a freshly built same-architecture
state_dict for the IBN-Net strict load, resnet_ibn.py:191-296).

This file is PUBLIC-UNTRUSTED-glue only — the reference code is
executed purely as a test oracle, with synthetic weights, inside test
processes.
"""

from __future__ import annotations

import importlib
import re
import sys
import types
from typing import Dict

import numpy as np
import torch
import torch.nn as nn

REF_ROOT = "/root/reference"

# torchvision vgg configurations (the public 'D'/'E' tables; torchvision
# models/vgg.py layout: conv(+bn)+relu per entry, maxpool per 'M',
# including the trailing pool the reference slices around).
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


class _VGGShim(nn.Module):
    """Structural stand-in for torchvision VGG: only ``.features`` (the
    sole attribute the reference touches) with torchvision's exact
    Sequential indexing."""

    def __init__(self, cfg, batch_norm):
        super().__init__()
        layers, in_c = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(in_c, v, 3, padding=1))
                if batch_norm:
                    layers.append(nn.BatchNorm2d(v))
                layers.append(nn.ReLU(inplace=True))
                in_c = v
        self.features = nn.Sequential(*layers)


def _make_torchvision():
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")

    def vgg16(pretrained=False, weights=None, **kw):
        return _VGGShim(_VGG16_CFG, batch_norm=False)

    def vgg16_bn(pretrained=False, weights=None, **kw):
        return _VGGShim(_VGG16_CFG, batch_norm=True)

    def vgg19(pretrained=False, weights=None, **kw):
        return _VGGShim(_VGG19_CFG, batch_norm=False)

    class VGG16_BN_Weights:
        DEFAULT = "DEFAULT"

    class VGG19_Weights:
        DEFAULT = "DEFAULT"

    class VGG16_Weights:
        DEFAULT = "DEFAULT"

    tvm.vgg16, tvm.vgg16_bn, tvm.vgg19 = vgg16, vgg16_bn, vgg19
    tvm.VGG16_BN_Weights = VGG16_BN_Weights
    tvm.VGG19_Weights = VGG19_Weights
    tvm.VGG16_Weights = VGG16_Weights
    tv.models = tvm
    return tv, tvm


class _TimmMlp(nn.Module):
    """timm layers.Mlp: fc1 → act → fc2 (state-dict keys fc1/fc2)."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, drop=0.0, **kw):
        super().__init__()
        hidden = hidden_features or in_features
        out = out_features or in_features
        self.fc1 = nn.Linear(in_features, hidden)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden, out)
        self.drop = nn.Dropout(drop if isinstance(drop, float) else 0.0)

    def forward(self, x):
        return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))


class _TimmAttention(nn.Module):
    """Placeholder — CCTrans's GroupBlock deletes Block.attn before use
    (CCTrans.py:239)."""

    def __init__(self, *a, **kw):
        super().__init__()

    def forward(self, x):  # pragma: no cover - never reached
        raise NotImplementedError


class _TimmBlock(nn.Module):
    """timm vision_transformer.Block surface that CCTrans's GroupBlock
    relies on (CCTrans.py:229-249): norm1 / attn (deleted+replaced) /
    drop_path1 / norm2 / mlp / drop_path2."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                 proj_drop=0.0, attn_drop=0.0, init_values=None,
                 drop_path=0.0, act_layer=nn.GELU,
                 norm_layer=nn.LayerNorm, **kw):
        super().__init__()
        self.norm1 = norm_layer(dim)
        self.attn = _TimmAttention()
        self.drop_path1 = nn.Identity()
        self.norm2 = norm_layer(dim)
        self.mlp = _TimmMlp(dim, int(dim * float(mlp_ratio)),
                            act_layer=act_layer, drop=0.0)
        self.drop_path2 = nn.Identity()

    def forward(self, x):
        x = x + self.drop_path1(self.attn(self.norm1(x)))
        return x + self.drop_path2(self.mlp(self.norm2(x)))


class _DropPath(nn.Module):
    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        return x  # eval-time identity; CCTrans uses Identity anyway


def _make_timm():
    timm = types.ModuleType("timm")
    tm = types.ModuleType("timm.models")
    tml = types.ModuleType("timm.models.layers")
    tmr = types.ModuleType("timm.models.registry")
    tmv = types.ModuleType("timm.models.vision_transformer")

    tml.DropPath = _DropPath
    tml.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    tml.trunc_normal_ = torch.nn.init.trunc_normal_
    tmr.register_model = lambda fn: fn
    tmv._cfg = lambda url="", **kw: dict(url=url, **kw)
    tmv.Block = _TimmBlock
    tmv.Attention = _TimmAttention
    tmv.Mlp = _TimmMlp
    timm.models = tm
    tm.layers, tm.registry, tm.vision_transformer = tml, tmr, tmv
    return timm, tm, tml, tmr, tmv


def _make_kmeans1d():
    from dgvcc_tpu.utils.kmeans1d import cluster

    km = types.ModuleType("kmeans1d")
    km.cluster = cluster
    return km


def _fake_hub_load(url, *a, **k):
    """IBN-Net strict pretrained load (resnet_ibn.py:191-296): return a
    freshly built same-architecture state_dict so load_state_dict
    succeeds without network."""
    m = re.search(r"/([A-Za-z0-9_]+?)(?:-[0-9a-f]+)?\.pth", url)
    if m is not None:
        for modname in ("models.ibnnet.resnet_ibn", "models.ibnnet"):
            mod = sys.modules.get(modname)
            if mod is not None and hasattr(mod, m.group(1)):
                return getattr(mod, m.group(1))(pretrained=False).state_dict()
    return {}


_installed = False


def install_shims():
    global _installed
    if _installed:
        return
    if "torchvision" not in sys.modules:
        tv, tvm = _make_torchvision()
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    if "timm" not in sys.modules:
        timm, tm, tml, tmr, tmv = _make_timm()
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tm
        sys.modules["timm.models.layers"] = tml
        sys.modules["timm.models.registry"] = tmr
        sys.modules["timm.models.vision_transformer"] = tmv
    if "kmeans1d" not in sys.modules:
        sys.modules["kmeans1d"] = _make_kmeans1d()
    import torch.utils.model_zoo as model_zoo

    model_zoo.load_url = lambda *a, **k: {}
    torch.hub.load_state_dict_from_url = _fake_hub_load
    # The reference hard-codes .cuda() at construction time
    # (ISW/cov_settings.py:21, ISW/__init__.py:22); run the oracle on CPU.
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self
    # cov_settings.set_mask_matrix gates a print on the device index
    # (cov_settings.py:79) — satisfy it without CUDA.
    torch.cuda.current_device = lambda: 0
    _installed = True


def ref_import(modname: str):
    """Import a module from the reference tree (with shims installed)."""
    install_shims()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module(modname)


# ---- state-dict randomization --------------------------------------------

def randomize_state_dict(model: nn.Module, seed: int) -> Dict[str, np.ndarray]:
    """Replace every tensor in ``model.state_dict()`` with a random but
    numerically healthy value (He-scaled convs/linears so resnet50-deep
    eval forwards stay finite under random BN running stats), load it
    back strictly (validating full coverage), switch the model to eval,
    and return the numpy state dict for the flax converter."""
    rng = np.random.default_rng(seed)
    out_t, out_np = {}, {}
    for k, v in model.state_dict().items():
        a = v.detach().cpu().numpy()
        if "num_batches_tracked" in k:
            out_t[k] = v
            out_np[k] = a
            continue
        if k.endswith("running_cov"):
            c = a.shape[-1]
            arr = (np.eye(c, dtype=np.float32)
                   + rng.uniform(0, 0.05, a.shape).astype(np.float32))
        elif k.endswith("running_var"):
            arr = rng.uniform(0.5, 2.0, a.shape).astype(np.float32)
        elif a.ndim >= 2:
            fan_in = max(int(np.prod(a.shape[1:])), 1)
            arr = rng.normal(0, (2.0 / fan_in) ** 0.5,
                             a.shape).astype(np.float32)
        elif k.endswith("weight") or "sw_mean_weight" in k \
                or "sw_var_weight" in k:
            arr = rng.uniform(0.5, 1.5, a.shape).astype(np.float32)
        else:  # bias / running_mean / 1-d buffers
            arr = rng.normal(0, 0.1, a.shape).astype(np.float32)
        out_t[k] = torch.tensor(arr)
        out_np[k] = arr
    model.load_state_dict(out_t)  # strict: validates coverage
    model.eval()
    return out_np


def assert_forward_close(ours_nhwc, golden_nchw, rtol=1e-3, what=""):
    """Compare a flax NHWC output against a torch NCHW golden with an
    absolute floor scaled to the golden's magnitude (the two stacks
    accumulate f32 sums in different orders)."""
    g = np.transpose(np.asarray(golden_nchw), (0, 2, 3, 1))
    o = np.asarray(ours_nhwc)
    assert o.shape == g.shape, f"{what}: shape {o.shape} vs golden {g.shape}"
    atol = 1e-4 * max(float(np.abs(g).max()), 1.0)
    np.testing.assert_allclose(o, g, rtol=rtol, atol=atol, err_msg=what)
