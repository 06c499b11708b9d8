"""torch→flax conversion parity: our VGG graph with converted weights
must reproduce a functional-torch forward of the same stack."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from dgvcc_tpu.nn.vgg import VGG16_CFG, VGGFeatures, feature_layout
from dgvcc_tpu.nn.torch_io import vgg_features_to_flax, conv_to_flax


def synth_vgg_sd(cfg, batch_norm, rng):
    """Random torchvision-format state dict for a VGG features stack."""
    sd = {}
    in_ch = 3
    for kind, idx, arg in feature_layout(cfg, batch_norm):
        if kind == "conv":
            sd[f"features.{idx}.weight"] = rng.normal(
                0, 0.1, (arg, in_ch, 3, 3)).astype(np.float32)
            sd[f"features.{idx}.bias"] = rng.normal(0, 0.1, (arg,)).astype(np.float32)
            in_ch = arg
        elif kind == "bn":
            sd[f"features.{idx}.weight"] = rng.uniform(0.5, 1.5, (arg,)).astype(np.float32)
            sd[f"features.{idx}.bias"] = rng.normal(0, 0.1, (arg,)).astype(np.float32)
            sd[f"features.{idx}.running_mean"] = rng.normal(0, 0.1, (arg,)).astype(np.float32)
            sd[f"features.{idx}.running_var"] = rng.uniform(0.5, 1.5, (arg,)).astype(np.float32)
    return sd


def torch_forward(sd, cfg, batch_norm, x_nchw, stop):
    """Functional torch eval-mode forward of features[:stop]."""
    y = torch.tensor(x_nchw)
    for kind, idx, _arg in feature_layout(cfg, batch_norm):
        if idx >= stop:
            break
        if kind == "conv":
            y = TF.conv2d(y, torch.tensor(sd[f"features.{idx}.weight"]),
                          torch.tensor(sd[f"features.{idx}.bias"]), padding=1)
        elif kind == "bn":
            y = TF.batch_norm(
                y,
                torch.tensor(sd[f"features.{idx}.running_mean"]),
                torch.tensor(sd[f"features.{idx}.running_var"]),
                torch.tensor(sd[f"features.{idx}.weight"]),
                torch.tensor(sd[f"features.{idx}.bias"]),
                training=False, eps=1e-5,
            )
        elif kind == "relu":
            y = TF.relu(y)
        elif kind == "pool":
            y = TF.max_pool2d(y, 2, 2)
    return y.numpy()


@pytest.mark.parametrize("stop", [23, 43])
def test_vgg16bn_conversion_matches_torch(stop):
    rng = np.random.default_rng(0)
    # shrink the net for test speed: take cfg prefix covering `stop`
    cfg = VGG16_CFG
    sd = synth_vgg_sd(cfg, True, rng)

    params, stats = vgg_features_to_flax(sd, cfg, True, 0, stop)
    model = VGGFeatures(cfg=tuple(cfg), batch_norm=True, start=0, stop=stop)
    x = rng.normal(0, 1, (1, 32, 32, 3)).astype(np.float32)

    out = model.apply({"params": params, "batch_stats": stats}, x)
    golden = torch_forward(sd, cfg, True, np.transpose(x, (0, 3, 1, 2)), stop)
    # float32 conv accumulation order differs between backends; after
    # 10+ layers ~0.1% of elements drift by ~1e-3 on O(1) magnitudes
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(golden, (0, 2, 3, 1)), rtol=5e-2, atol=3e-3
    )


def test_conv_layout_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
    x = rng.normal(size=(1, 3, 10, 10)).astype(np.float32)
    golden = TF.conv2d(torch.tensor(x), torch.tensor(w), padding=1).numpy()

    import jax.numpy as jnp
    from flax import linen as nn

    conv = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    variables = {"params": {"kernel": conv_to_flax(w)}}
    out = conv.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(golden, (0, 2, 3, 1)), rtol=1e-4, atol=1e-5
    )


def test_graft_into_dg_model():
    import jax
    import jax.numpy as jnp
    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.nn.torch_io import load_vgg16bn_into_dg

    rng = np.random.default_rng(2)
    sd = synth_vgg_sd(VGG16_CFG, True, rng)
    model = MODELS.build("base")
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    v2 = load_vgg16bn_into_dg(dict(variables), sd)
    # the encoder kernel actually changed to the torch weights
    k = np.asarray(v2["params"]["enc1"]["conv0"]["kernel"])
    np.testing.assert_array_equal(k, conv_to_flax(sd["features.0.weight"]))
    # and the model still runs
    d = model.apply(v2, x)
    assert d.shape == (1, 32, 32, 1)


def test_trainer_loads_pretrained_backbone(tmp_path):
    """Config pretrained_weights → backbone grafted into the train state."""
    import torch
    import yaml
    from dgvcc_tpu.core.config import Config
    from dgvcc_tpu.train.trainer import DGTrainer

    rng = np.random.default_rng(3)
    sd = synth_vgg_sd(VGG16_CFG, True, rng)
    pth = tmp_path / "vgg16_bn.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, pth)

    cfg = Config.from_dict({
        "seed": 0, "version": "pt", "log_para": 1000, "patch_size": 1440,
        "mode": "simple", "num_epochs": 1,
        "model": {"name": "base", "params": {"pretrained": True}},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "compute_dtype": "float32",
        "log_dir": str(tmp_path / "logs"),
        "pretrained_weights": {"vgg16_bn": str(pth)},
        "train_dataset": {"name": "den", "params": {
            "root": str(tmp_path), "crop_size": 64, "downsample": 1}},
    })
    t = DGTrainer(cfg)
    t.build()
    k = np.asarray(t.state.params["enc1"]["conv0"]["kernel"])
    np.testing.assert_array_equal(k, conv_to_flax(sd["features.0.weight"]))
    m = np.asarray(t.state.batch_stats["enc3"]["bn41"]["mean"])
    np.testing.assert_array_equal(m, sd["features.41.running_mean"])


def synth_resnet50_sd(rng, num_stages=3):
    """Random torchvision-format resnet50 state dict (trunk only)."""
    sd = {}

    def add_bn(prefix, ch):
        sd[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.1, ch).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(0, 0.1, ch).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)

    sd["conv1.weight"] = rng.normal(0, 0.05, (64, 3, 7, 7)).astype(np.float32)
    add_bn("bn1", 64)
    layers = (3, 4, 6, 3)
    inplanes = 64
    for k in range(num_stages):
        planes = 64 * 2**k
        for i in range(layers[k]):
            tp = f"layer{k+1}.{i}"
            sd[f"{tp}.conv1.weight"] = rng.normal(0, 0.05, (planes, inplanes, 1, 1)).astype(np.float32)
            add_bn(f"{tp}.bn1", planes)
            sd[f"{tp}.conv2.weight"] = rng.normal(0, 0.05, (planes, planes, 3, 3)).astype(np.float32)
            add_bn(f"{tp}.bn2", planes)
            sd[f"{tp}.conv3.weight"] = rng.normal(0, 0.05, (planes * 4, planes, 1, 1)).astype(np.float32)
            add_bn(f"{tp}.bn3", planes * 4)
            if i == 0:
                stride = 1 if k == 0 else 2
                sd[f"{tp}.downsample.0.weight"] = rng.normal(
                    0, 0.05, (planes * 4, inplanes, 1, 1)).astype(np.float32)
                add_bn(f"{tp}.downsample.1", planes * 4)
            inplanes = planes * 4
    return sd


def torch_resnet_forward(sd, x_nchw, num_stages=3):
    """Functional torch eval forward of the resnet50 trunk."""
    def bn(x, p):
        return TF.batch_norm(x, torch.tensor(sd[f"{p}.running_mean"]),
                             torch.tensor(sd[f"{p}.running_var"]),
                             torch.tensor(sd[f"{p}.weight"]),
                             torch.tensor(sd[f"{p}.bias"]),
                             training=False, eps=1e-5)

    x = torch.tensor(x_nchw)
    x = TF.conv2d(x, torch.tensor(sd["conv1.weight"]), stride=2, padding=3)
    x = TF.relu(bn(x, "bn1"))
    x = TF.max_pool2d(x, 3, 2, padding=1)
    layers = (3, 4, 6, 3)
    for k in range(num_stages):
        for i in range(layers[k]):
            tp = f"layer{k+1}.{i}"
            res = x
            y = TF.relu(bn(TF.conv2d(x, torch.tensor(sd[f"{tp}.conv1.weight"])), f"{tp}.bn1"))
            stride = 2 if (k > 0 and i == 0) else 1
            y = TF.relu(bn(TF.conv2d(y, torch.tensor(sd[f"{tp}.conv2.weight"]),
                                     stride=stride, padding=1), f"{tp}.bn2"))
            y = bn(TF.conv2d(y, torch.tensor(sd[f"{tp}.conv3.weight"])), f"{tp}.bn3")
            if f"{tp}.downsample.0.weight" in sd:
                res = bn(TF.conv2d(x, torch.tensor(sd[f"{tp}.downsample.0.weight"]),
                                   stride=stride), f"{tp}.downsample.1")
            x = TF.relu(y + res)
    return x.numpy()


def test_resnet50_conversion_matches_torch():
    from dgvcc_tpu.nn.resnet import ResNetTrunk
    from dgvcc_tpu.nn.torch_io import resnet50_to_flax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    sd = synth_resnet50_sd(rng, num_stages=2)
    params, stats = resnet50_to_flax(sd, num_stages=2)
    trunk = ResNetTrunk(layers=(3, 4, 6, 3), num_stages=2)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out, _ = trunk.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(x))
    golden = torch_resnet_forward(sd, np.transpose(x, (0, 3, 1, 2)), num_stages=2)
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(golden, (0, 2, 3, 1)),
                               rtol=5e-2, atol=5e-3)


def test_resnet50_pretrained_into_isw_counter(tmp_path):
    """Non-strict graft: BN weights land in the ISW counter's backbone,
    whitening sites keep their init, the model still runs."""
    import jax
    import jax.numpy as jnp
    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.nn.torch_io import load_pretrained_backbone

    rng = np.random.default_rng(6)
    sd = synth_resnet50_sd(rng, num_stages=3)
    pth = tmp_path / "resnet50.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, pth)

    model = MODELS.build("isw")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    from dgvcc_tpu.nn.torch_io import load_torch_state_dict
    v2, desc = load_pretrained_backbone(
        dict(variables), "isw", {"resnet50": str(pth)})
    assert "resnet50" in desc
    k = np.asarray(v2["params"]["net"]["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(
        k, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    d = model.apply(v2, x)
    assert d.shape == (1, 64, 64, 1)


def test_altgvt_conversion_spot_check(tmp_path):
    """Twins state dict converts and grafts into the CCTrans backbone."""
    import jax
    import jax.numpy as jnp
    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.nn.torch_io import load_pretrained_backbone, linear_to_flax

    rng = np.random.default_rng(7)
    dims = (32, 64, 128, 256)
    heads = (2, 4, 8, 16)
    depths = (1, 1, 1, 1)
    srs = (8, 4, 2, 1)

    sd = {}
    in_ch = 3
    for k, d in enumerate(dims):
        patch = 4 if k == 0 else 2
        sd[f"patch_embeds.{k}.proj.weight"] = rng.normal(0, 0.05, (d, in_ch, patch, patch)).astype(np.float32)
        sd[f"patch_embeds.{k}.proj.bias"] = np.zeros(d, np.float32)
        sd[f"patch_embeds.{k}.norm.weight"] = np.ones(d, np.float32)
        sd[f"patch_embeds.{k}.norm.bias"] = np.zeros(d, np.float32)
        sd[f"pos_block.{k}.proj.0.weight"] = rng.normal(0, 0.05, (d, 1, 3, 3)).astype(np.float32)
        sd[f"pos_block.{k}.proj.0.bias"] = np.zeros(d, np.float32)
        for i in range(depths[k]):
            p = f"blocks.{k}.{i}"
            for n in ("norm1", "norm2"):
                sd[f"{p}.{n}.weight"] = np.ones(d, np.float32)
                sd[f"{p}.{n}.bias"] = np.zeros(d, np.float32)
            if i % 2 == 0:  # window attention
                sd[f"{p}.attn.qkv.weight"] = rng.normal(0, 0.05, (3 * d, d)).astype(np.float32)
                sd[f"{p}.attn.qkv.bias"] = np.zeros(3 * d, np.float32)
            else:
                sd[f"{p}.attn.q.weight"] = rng.normal(0, 0.05, (d, d)).astype(np.float32)
                sd[f"{p}.attn.q.bias"] = np.zeros(d, np.float32)
                sd[f"{p}.attn.kv.weight"] = rng.normal(0, 0.05, (2 * d, d)).astype(np.float32)
                sd[f"{p}.attn.kv.bias"] = np.zeros(2 * d, np.float32)
                if srs[k] > 1:
                    sd[f"{p}.attn.sr.weight"] = rng.normal(0, 0.05, (d, d, srs[k], srs[k])).astype(np.float32)
                    sd[f"{p}.attn.sr.bias"] = np.zeros(d, np.float32)
                    sd[f"{p}.attn.norm.weight"] = np.ones(d, np.float32)
                    sd[f"{p}.attn.norm.bias"] = np.zeros(d, np.float32)
            sd[f"{p}.attn.proj.weight"] = rng.normal(0, 0.05, (d, d)).astype(np.float32)
            sd[f"{p}.attn.proj.bias"] = np.zeros(d, np.float32)
            sd[f"{p}.mlp.fc1.weight"] = rng.normal(0, 0.05, (4 * d, d)).astype(np.float32)
            sd[f"{p}.mlp.fc1.bias"] = np.zeros(4 * d, np.float32)
            sd[f"{p}.mlp.fc2.weight"] = rng.normal(0, 0.05, (d, 4 * d)).astype(np.float32)
            sd[f"{p}.mlp.fc2.bias"] = np.zeros(d, np.float32)
        in_ch = d
    pth = tmp_path / "alt_gvt.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, pth)

    model = MODELS.build("cctrans", embed_dims=dims, num_heads=heads,
                         depths=depths, wss=(4, 4, 4, 4), sr_ratios=srs)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    v2, desc = load_pretrained_backbone(dict(variables), "cctrans",
                                        {"alt_gvt": str(pth)})
    assert "alt_gvt" in desc
    got = np.asarray(v2["params"]["block0_0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_array_equal(got, linear_to_flax(sd["blocks.0.0.attn.qkv.weight"]))
    got = np.asarray(v2["params"]["patch_embed1"]["proj"]["kernel"])
    np.testing.assert_array_equal(
        got, np.transpose(sd["patch_embeds.1.proj.weight"], (2, 3, 1, 0)))
    d = model.apply(v2, x)
    assert d.shape == (1, 8, 8, 1)

@pytest.mark.parametrize("stop", [26, 52])
def test_vgg19_plain_conversion_matches_torch(stop):
    """Plain (no-BN) vgg19 features — the Generator/BL-VGG backbone
    (models2.py:31-33, baselines/BL.py:52-55)."""
    from dgvcc_tpu.nn.vgg import VGG19_CFG

    rng = np.random.default_rng(8)
    sd = synth_vgg_sd(VGG19_CFG, False, rng)
    params, stats = vgg_features_to_flax(sd, VGG19_CFG, False, 0, stop)
    model = VGGFeatures(cfg=tuple(VGG19_CFG), batch_norm=False, start=0, stop=stop)
    x = rng.normal(0, 1, (1, 32, 32, 3)).astype(np.float32)
    out = model.apply({"params": params}, x)
    golden = torch_forward(sd, VGG19_CFG, False, np.transpose(x, (0, 3, 1, 2)), stop)
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(golden, (0, 2, 3, 1)), rtol=5e-2, atol=3e-3)


def test_vgg19_into_bl_and_generators(tmp_path):
    import jax
    import jax.numpy as jnp
    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.nn.vgg import VGG19_CFG
    from dgvcc_tpu.nn.torch_io import load_pretrained_backbone

    rng = np.random.default_rng(9)
    sd = synth_vgg_sd(VGG19_CFG, False, rng)
    pth = tmp_path / "vgg19.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, pth)

    for name, path0 in (("bl", ("features",)), ("gen", ("enc",)),
                        ("gen0", ("enc1",))):
        model = MODELS.build(name)
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, x)
        v2, desc = load_pretrained_backbone(dict(variables), name,
                                            {"vgg19": str(pth)})
        assert "vgg19" in desc, name
        node = v2["params"]
        for p in path0:
            node = node[p]
        np.testing.assert_array_equal(
            np.asarray(node["conv0"]["kernel"]),
            conv_to_flax(sd["features.0.weight"]), err_msg=name)
        out = model.apply(v2, x)
        assert np.all(np.isfinite(np.asarray(out))), name


def test_vgg19_sw_remap(tmp_path):
    """SWCounter_VGG index-remap contract (SW/backbones/vgg.py:29-45):
    the k-th torchvision vgg19 conv lands on the k-th SW-stack conv;
    SW layers keep their init."""
    import jax
    import jax.numpy as jnp
    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.nn.vgg import VGG19_CFG
    from dgvcc_tpu.nn.torch_io import load_pretrained_backbone

    rng = np.random.default_rng(10)
    sd = synth_vgg_sd(VGG19_CFG, False, rng)
    pth = tmp_path / "vgg19.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, pth)

    model = MODELS.build("sw_vgg")
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    sw_before = np.asarray(variables["params"]["sw0"]["sw_mean_weight"])
    v2, desc = load_pretrained_backbone(dict(variables), "sw_vgg",
                                        {"vgg19": str(pth)})
    assert "remap" in desc
    # k-th conv correspondence: tv idx 0→conv0, 2→conv1, 5→conv3
    # (position 2 in the cfg is a pool; the reference's idx_dict
    # {0:0, 2:3, 5:7, ...} encodes the same k-th-conv rule for its
    # conv/sw/relu Sequential)
    for tv_idx, pos in ((0, 0), (2, 1), (5, 3), (34, 19)):
        np.testing.assert_array_equal(
            np.asarray(v2["params"][f"conv{pos}"]["kernel"]),
            conv_to_flax(sd[f"features.{tv_idx}.weight"]),
            err_msg=f"tv{tv_idx}->conv{pos}")
    # SW params untouched
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["sw0"]["sw_mean_weight"]), sw_before)


def test_vgg16_into_csrnet_and_dssinet(tmp_path):
    import jax
    import jax.numpy as jnp
    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.nn.torch_io import load_pretrained_backbone

    rng = np.random.default_rng(11)
    sd = synth_vgg_sd(VGG16_CFG, False, rng)
    pth = tmp_path / "vgg16.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, pth)

    # CSRNet: first 10 convs positionally into frontend conv0-9
    model = MODELS.build("csrnet")
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    v2, desc = load_pretrained_backbone(dict(variables), "csrnet",
                                        {"vgg16": str(pth)})
    assert "frontend" in desc
    # 3rd conv of vgg16 is features.5 → frontend conv2
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["frontend"]["conv2"]["kernel"]),
        conv_to_flax(sd["features.5.weight"]))
    out = model.apply(v2, x)
    assert np.all(np.isfinite(np.asarray(out)))

    # DSSINet: 2/2/3/3 convs into stage1-4
    model = MODELS.build("dssinet")
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    v2, desc = load_pretrained_backbone(dict(variables), "dssinet",
                                        {"vgg16": str(pth)})
    assert "stage1-4" in desc
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["stage2"]["conv0"]["kernel"]),
        conv_to_flax(sd["features.5.weight"]))
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["stage4"]["conv2"]["kernel"]),
        conv_to_flax(sd["features.21.weight"]))

def test_vgg19_bn_into_bl_variant(tmp_path):
    """BLVGG batch_norm=True accepts torchvision vgg19_bn weights."""
    import jax
    import jax.numpy as jnp
    from dgvcc_tpu.core.registry import MODELS
    import dgvcc_tpu.models  # noqa: F401
    from dgvcc_tpu.nn.vgg import VGG19_CFG
    from dgvcc_tpu.nn.torch_io import load_pretrained_backbone

    rng = np.random.default_rng(12)
    sd = synth_vgg_sd(VGG19_CFG, True, rng)
    pth = tmp_path / "vgg19_bn.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, pth)

    model = MODELS.build("bl", batch_norm=True)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    v2, desc = load_pretrained_backbone(dict(variables), "bl",
                                        {"vgg19_bn": str(pth)},
                                        model_params={"batch_norm": True})
    assert desc == "vgg19_bn → features"
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["features"]["conv0"]["kernel"]),
        conv_to_flax(sd["features.0.weight"]))
    np.testing.assert_array_equal(
        np.asarray(v2["batch_stats"]["features"]["bn1"]["mean"]),
        sd["features.1.running_mean"])
    out = model.apply(v2, x)
    assert np.all(np.isfinite(np.asarray(out)))

    # layout mismatch is REFUSED, not silently mis-grafted: a BN model
    # offered only plain-vgg19 weights (and vice versa) keeps its init
    # and says why — grafting across layouts lands only conv0 because
    # the BN feature indices shift every later conv name
    before = np.asarray(variables["params"]["features"]["conv3"]["kernel"])
    v3, desc3 = load_pretrained_backbone(dict(variables), "bl",
                                         {"vgg19": str(pth)},
                                         model_params={"batch_norm": True})
    assert "no pretrained mapping" in desc3 and "vgg19_bn" in desc3
    np.testing.assert_array_equal(
        np.asarray(v3["params"]["features"]["conv3"]["kernel"]), before)
