"""flax → torch export round-trips (nn/torch_export.py).

Each family: randomize the actual reference module's state_dict,
import it with the forward converter, export it back against a template
with DIFFERENT values, and require bit-equality with the original for
every consumed key (the converters only re-index, so the round trip is
exact) and template passthrough for untouched keys. The mcnn test also
closes the loop in torch: ``load_state_dict(strict=True)`` on the
export and forward-parity against the flax model.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import dgvcc_tpu.models  # noqa: F401  (registry population)
from dgvcc_tpu.core.registry import MODELS
from dgvcc_tpu.nn.torch_export import (
    export_reference_checkpoint,
    save_reference_checkpoint,
)
from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

from reference_oracle import randomize_state_dict, ref_import


def _roundtrip(name, ref, seed, build_kwargs=None, rngs=("params",),
               init_kwargs=None, shape=(1, 64, 64, 3), dead_prefixes=()):
    """``dead_prefixes``: reference submodules the checkpoint carries but
    the forward never uses (so the converter rightly skips them); those
    keys — plus the integer ``num_batches_tracked`` counters — are only
    required to pass the template through. Every other key must
    round-trip bit-exactly."""
    sd = randomize_state_dict(ref, seed)
    template = randomize_state_dict(ref, seed + 1)
    model = MODELS.build(name, **(build_kwargs or {}))
    rngdict = {r: jax.random.PRNGKey(i) for i, r in enumerate(rngs)}
    v = model.init(rngdict, jnp.zeros(shape, jnp.float32),
                   **(init_kwargs or {}))
    v2 = load_reference_checkpoint(dict(v), sd, model)
    out = export_reference_checkpoint(v2, template, model)

    assert set(out) == set(sd)
    for k in sd:
        a, orig, tmp = (np.asarray(out[k]), np.asarray(sd[k]),
                        np.asarray(template[k]))
        exempt = ("num_batches_tracked" in k
                  or any(k.startswith(p) for p in dead_prefixes))
        if exempt:
            # untouched by the converter → template passthrough, exactly.
            # STRICT: if this equals `orig` instead, the converter now
            # consumes the key and its dead_prefixes entry is stale.
            assert np.array_equal(a, tmp), (
                f"{k}: exempt key must be template passthrough")
        else:
            assert np.array_equal(a, orig), f"{k}: did not round-trip"
    return v2, out


def test_mcnn_export_roundtrip_and_torch_load():
    MC = ref_import("models.baselines.MCNN")
    ref = MC.MCNN()
    v2, out = _roundtrip("mcnn", ref, 301)

    # close the loop in torch: strict load + forward parity vs flax
    ref2 = MC.MCNN()
    ref2.load_state_dict({k: torch.tensor(np.asarray(v))
                          for k, v in out.items()}, strict=True)
    ref2.eval()
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        golden = ref2(torch.tensor(x)).numpy()
    model = MODELS.build("mcnn")
    ours = np.transpose(
        np.asarray(model.apply(v2, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))),
        (0, 3, 1, 2))
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_export_save_torch_file(tmp_path):
    MC = ref_import("models.baselines.MCNN")
    ref = MC.MCNN()
    _, out = _roundtrip("mcnn", ref, 303)
    p = str(tmp_path / "exported.pth")
    save_reference_checkpoint(p, out)
    loaded = torch.load(p, weights_only=True)
    ref.load_state_dict(loaded, strict=True)


def test_dg_final_export_roundtrip():
    MM = ref_import("models.models")
    ref = MM.DGModel_final(pretrained=False)
    _roundtrip("final", ref, 305, rngs=("params", "dropout"))


def test_ibn_export_roundtrip():
    # IBN-a splits BN params channel-wise into IN/BN halves — the probe
    # must recover the interleaved inverse exactly
    IB = ref_import("models.ibnnet")
    ref = IB.IBNCounter_ResNet()
    _roundtrip("ibn", ref, 307, init_kwargs={"train": False})


def test_dssinet_export_roundtrip():
    # shared VGG pyramid: several flax sites export into the same torch
    # keys — values agree, the conflict check must accept them
    DS = ref_import("models.baselines.DSSINet")
    ref = DS.CRFVGG()
    # the reference forward (DSSINet.py:343-412) only ever executes the
    # relu3 (crossed by the '0'->'7' slice) and relu22 (conv4_3 slice)
    # PReLUs; relu8/relu15 sit past every _na slice endpoint — dead
    _roundtrip("dssinet", ref, 309, init_kwargs={"train": False},
               dead_prefixes=("front_end.features.relu8.",
                              "front_end.features.relu15."))


# ---- remaining families: same round-trip, one row per family ----------

_CC = dict(embed_dims=(32, 256, 512, 1024), num_heads=(2, 8, 16, 32),
           depths=(2, 2, 2, 2), wss=(2, 2, 2, 2), sr_ratios=(8, 4, 2, 1))


def _make_ref(family):
    if family == "bl":
        return ref_import("models.baselines.BL").BL_VGG(pretrained=False)
    if family == "csrnet":
        return ref_import("models.baselines.CSRNet").CSRNet(load_weights=False)
    if family == "sasnet":
        return ref_import("models.baselines.SASNet").SASNet(pretrained=False)
    if family == "sw":
        return ref_import("models.SW").SWCounter_ResNet()
    if family == "sw_vgg":
        return ref_import("models.SW").SWCounter_VGG()
    if family == "isw":
        return ref_import("models.ISW").ISWCounter_ResNet(
            criterion=torch.nn.MSELoss())
    if family == "gen":
        return ref_import("models.models2").Generator()
    if family == "reg_mem":
        return ref_import("models.models2").DensityRegressorM(pretrained=False)
    if family == "cctrans":
        from functools import partial
        return ref_import("models.baselines.CCTrans").ALTGVT(
            patch_size=4, embed_dims=list(_CC["embed_dims"]),
            num_heads=list(_CC["num_heads"]), mlp_ratios=[4, 4, 4, 4],
            qkv_bias=True, norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
            depths=list(_CC["depths"]), wss=list(_CC["wss"]),
            sr_ratios=list(_CC["sr_ratios"]))
    raise KeyError(family)


_ROWS = [
    # family, build_kwargs, rngs, init_kwargs, dead_prefixes
    ("bl", None, ("params",), None, ()),
    ("csrnet", None, ("params",), None, ()),
    ("sasnet", None, ("params",), {"train": False}, ()),
    ("sw", None, ("params",), None, ()),
    ("sw_vgg", None, ("params",), None, ()),
    # reference ISWCounter truncates its ResNet at layer3
    # (ISW/__init__.py / network/resnet.py) but the module still carries
    # the full layer4+fc — 15M params of dead weight the converter skips
    ("isw", None, ("params",), {"train": False}, ("layer4.", "fc.")),
    ("gen", None, ("params", "dropout"), None, ()),
    ("reg_mem", None, ("params", "dropout"), None, ()),
    # the counting forward (CCTrans.py CPVTV2.forward_features:452-471)
    # never applies the Twins classifier's final norm/head — dead keys
    ("cctrans", dict(_CC), ("params", "dropout"), {"train": False},
     ("norm.", "head.")),
]


@pytest.mark.parametrize("family,bk,rngs,ik,dead", _ROWS,
                         ids=[r[0] for r in _ROWS])
def test_family_export_roundtrip(family, bk, rngs, ik, dead):
    ref = _make_ref(family)
    _roundtrip(family, ref, 311 + 2 * len(family), build_kwargs=bk,
               rngs=rngs, init_kwargs=ik, dead_prefixes=dead)
