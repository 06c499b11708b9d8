"""Backbone-variant coverage: DenseNet (plain/SW/IBN), ResNeXt-IBN,
SE-ResNet-IBN, IBN-a, and deep-ResNet geometries.

The reference ships these backbones without attaching counters
(models/SW/backbones/densenet.py, models/ibnnet/{densenet_ibn,
resnext_ibn,se_resnet_ibn}.py, resnet 101/152 geometries); here they
are first-class counter options, parity-tested against functional-torch
goldens on tiny geometries.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import dgvcc_tpu.models  # noqa: F401  (registers counters)
from dgvcc_tpu.core.registry import MODELS

BLOCKS = (2, 2, 2, 2)  # tiny densenet block config for tests


def synth_densenet_sd(rng, block_config=BLOCKS, growth=8, init_feats=16,
                      bn_size=2, num_stages=3):
    """Random torchvision-format densenet state dict (trunk only)."""
    sd = {}

    def add_bn(prefix, ch):
        sd[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.1, ch).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(0, 0.1, ch).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)

    sd["features.conv0.weight"] = rng.normal(
        0, 0.05, (init_feats, 3, 7, 7)).astype(np.float32)
    add_bn("features.norm0", init_feats)
    feats = init_feats
    for b in range(num_stages):
        for i in range(block_config[b]):
            tp = f"features.denseblock{b + 1}.denselayer{i + 1}"
            add_bn(f"{tp}.norm1", feats)
            sd[f"{tp}.conv1.weight"] = rng.normal(
                0, 0.05, (bn_size * growth, feats, 1, 1)).astype(np.float32)
            add_bn(f"{tp}.norm2", bn_size * growth)
            sd[f"{tp}.conv2.weight"] = rng.normal(
                0, 0.05, (growth, bn_size * growth, 3, 3)).astype(np.float32)
            feats += growth
        add_bn(f"features.transition{b + 1}.norm", feats)
        if b < num_stages - 1:
            sd[f"features.transition{b + 1}.conv.weight"] = rng.normal(
                0, 0.05, (feats // 2, feats, 1, 1)).astype(np.float32)
            feats //= 2
    return sd


def torch_densenet_forward(sd, x_nchw, block_config=BLOCKS, num_stages=3):
    """Functional torch eval forward, truncated after denseblock3 +
    transition3's norm (the trunk's num_stages=3 contract)."""

    def bn(x, p):
        return TF.batch_norm(
            x, torch.tensor(sd[f"{p}.running_mean"]),
            torch.tensor(sd[f"{p}.running_var"]),
            torch.tensor(sd[f"{p}.weight"]), torch.tensor(sd[f"{p}.bias"]),
            training=False, eps=1e-5)

    x = torch.tensor(x_nchw)
    x = TF.conv2d(x, torch.tensor(sd["features.conv0.weight"]),
                  stride=2, padding=3)
    x = TF.relu(bn(x, "features.norm0"))
    x = TF.max_pool2d(x, 3, 2, padding=1)
    for b in range(num_stages):
        for i in range(block_config[b]):
            tp = f"features.denseblock{b + 1}.denselayer{i + 1}"
            y = TF.relu(bn(x, f"{tp}.norm1"))
            y = TF.conv2d(y, torch.tensor(sd[f"{tp}.conv1.weight"]))
            y = TF.relu(bn(y, f"{tp}.norm2"))
            y = TF.conv2d(y, torch.tensor(sd[f"{tp}.conv2.weight"]), padding=1)
            x = torch.cat([x, y], 1)
        x = bn(x, f"features.transition{b + 1}.norm")
        x = TF.relu(x)
        if b < num_stages - 1:
            x = TF.conv2d(
                x, torch.tensor(sd[f"features.transition{b + 1}.conv.weight"]))
            x = TF.avg_pool2d(x, 2, 2)
    return x.numpy()


def test_densenet_conversion_matches_torch():
    import jax.numpy as jnp

    from dgvcc_tpu.nn.densenet import DenseNetTrunk
    from dgvcc_tpu.nn.torch_io import densenet_to_flax

    rng = np.random.default_rng(11)
    sd = synth_densenet_sd(rng)
    params, stats = densenet_to_flax(sd, num_stages=3)
    trunk = DenseNetTrunk(growth_rate=8, block_config=BLOCKS,
                          num_init_features=16, bn_size=2, num_stages=3)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = trunk.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    golden = torch_densenet_forward(sd, np.transpose(x, (0, 3, 1, 2)))
    assert out.shape[1:3] == (4, 4)  # stride 16
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(golden, (0, 2, 3, 1)),
                               rtol=5e-2, atol=5e-3)


@pytest.mark.parametrize("name,blocks", [
    # SW needs 16-divisible channels at every norm1 site: with growth 32
    # and 2-layer blocks each stage holds 64 ch after its transition
    ("sw_densenet", (2, 2, 2, 2)),
    ("ibn_densenet", (1, 1, 1, 1)),
])
def test_densenet_counters_run(name, blocks):
    import jax
    import jax.numpy as jnp

    model = MODELS.build(name, block_config=blocks)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x)
    d = model.apply(v, x)
    assert d.shape == (1, 64, 64, 1)
    # train-mode forward threads batch stats
    d2, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
    assert d2.shape == (1, 64, 64, 1)


def test_densenet_pretrained_into_sw_counter(tmp_path):
    """Non-strict graft: BN sites land, SW-replaced norm1 sites (i%3==0
    in stages 1-3 + norm0) keep their init, the counter still runs."""
    import jax
    import jax.numpy as jnp

    from dgvcc_tpu.nn.densenet import DENSENET_CONFIGS
    from dgvcc_tpu.nn.torch_io import load_pretrained_backbone

    rng = np.random.default_rng(12)
    cfg = DENSENET_CONFIGS[121]
    sd = synth_densenet_sd(rng, block_config=(2, 2, 2, 2),
                           growth=cfg["growth_rate"],
                           init_feats=cfg["num_init_features"], bn_size=4)
    pth = tmp_path / "densenet121.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, pth)

    model = MODELS.build("sw_densenet", block_config=(2, 2, 2, 2))
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x)
    v2, desc = load_pretrained_backbone(dict(v), "sw_densenet",
                                        {"densenet121": str(pth)})
    assert "densenet121" in desc
    bb = v2["params"]["backbone"]
    # conv0 grafted
    np.testing.assert_array_equal(
        np.asarray(bb["conv0"]["kernel"]),
        np.transpose(sd["features.conv0.weight"], (2, 3, 1, 0)))
    # norm2 (always BN) grafted
    np.testing.assert_array_equal(
        np.asarray(bb["denseblock1_denselayer1_norm2"]["scale"]),
        sd["features.denseblock1.denselayer1.norm2.weight"])
    d = model.apply(v2, x)
    assert d.shape == (1, 64, 64, 1)


def synth_resnext_sd(rng, layers=(1, 1, 1), groups=4, base_width=8, se=False):
    """Random torch-format resnext/se-resnet trunk state dict."""
    sd = {}

    def add_bn(prefix, ch):
        sd[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.1, ch).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(0, 0.1, ch).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)

    sd["conv1.weight"] = rng.normal(0, 0.05, (64, 3, 7, 7)).astype(np.float32)
    add_bn("bn1", 64)
    inplanes = 64
    for k in range(len(layers)):
        planes = 64 * 2**k
        width = int(planes * (base_width / 64)) * groups
        for i in range(layers[k]):
            tp = f"layer{k + 1}.{i}"
            sd[f"{tp}.conv1.weight"] = rng.normal(
                0, 0.05, (width, inplanes, 1, 1)).astype(np.float32)
            add_bn(f"{tp}.bn1", width)
            sd[f"{tp}.conv2.weight"] = rng.normal(
                0, 0.05, (width, width // groups, 3, 3)).astype(np.float32)
            add_bn(f"{tp}.bn2", width)
            sd[f"{tp}.conv3.weight"] = rng.normal(
                0, 0.05, (planes * 4, width, 1, 1)).astype(np.float32)
            add_bn(f"{tp}.bn3", planes * 4)
            if se:
                red = (planes * 4) // 16
                sd[f"{tp}.se.fc.0.weight"] = rng.normal(
                    0, 0.05, (red, planes * 4)).astype(np.float32)
                sd[f"{tp}.se.fc.2.weight"] = rng.normal(
                    0, 0.05, (planes * 4, red)).astype(np.float32)
            if i == 0:
                sd[f"{tp}.downsample.0.weight"] = rng.normal(
                    0, 0.05, (planes * 4, inplanes, 1, 1)).astype(np.float32)
                add_bn(f"{tp}.downsample.1", planes * 4)
            inplanes = planes * 4
    return sd


def torch_resnext_forward(sd, x_nchw, layers=(1, 1, 1), groups=4, se=False):
    def bn(x, p):
        return TF.batch_norm(
            x, torch.tensor(sd[f"{p}.running_mean"]),
            torch.tensor(sd[f"{p}.running_var"]),
            torch.tensor(sd[f"{p}.weight"]), torch.tensor(sd[f"{p}.bias"]),
            training=False, eps=1e-5)

    x = torch.tensor(x_nchw)
    x = TF.conv2d(x, torch.tensor(sd["conv1.weight"]), stride=2, padding=3)
    x = TF.relu(bn(x, "bn1"))
    x = TF.max_pool2d(x, 3, 2, padding=1)
    for k in range(len(layers)):
        for i in range(layers[k]):
            tp = f"layer{k + 1}.{i}"
            res = x
            y = TF.relu(bn(TF.conv2d(
                x, torch.tensor(sd[f"{tp}.conv1.weight"])), f"{tp}.bn1"))
            stride = 2 if (k > 0 and i == 0) else 1
            y = TF.relu(bn(TF.conv2d(
                y, torch.tensor(sd[f"{tp}.conv2.weight"]), stride=stride,
                padding=1, groups=groups), f"{tp}.bn2"))
            y = bn(TF.conv2d(y, torch.tensor(sd[f"{tp}.conv3.weight"])),
                   f"{tp}.bn3")
            if se:
                s = y.mean(dim=(2, 3))
                s = TF.relu(TF.linear(s, torch.tensor(sd[f"{tp}.se.fc.0.weight"])))
                s = torch.sigmoid(TF.linear(s, torch.tensor(sd[f"{tp}.se.fc.2.weight"])))
                y = y * s[:, :, None, None]
            if f"{tp}.downsample.0.weight" in sd:
                res = bn(TF.conv2d(
                    x, torch.tensor(sd[f"{tp}.downsample.0.weight"]),
                    stride=stride), f"{tp}.downsample.1")
            x = TF.relu(y + res)
    return x.numpy()


def test_resnext_trunk_matches_torch():
    """Grouped-conv bottleneck (ResNeXt type C, resnext_ibn.py:24-48)
    parity against a functional torch forward."""
    import jax.numpy as jnp

    from dgvcc_tpu.nn.resnet import ResNetTrunk
    from dgvcc_tpu.nn.torch_io import resnet50_to_flax

    rng = np.random.default_rng(13)
    layers = (1, 1, 1)
    sd = synth_resnext_sd(rng, layers=layers)
    params, stats = resnet50_to_flax(sd, num_stages=3, layers=layers)
    trunk = ResNetTrunk(layers=layers, num_stages=3, groups=4, base_width=8)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out, _ = trunk.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(x))
    golden = torch_resnext_forward(sd, np.transpose(x, (0, 3, 1, 2)),
                                   layers=layers)
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(golden, (0, 2, 3, 1)),
                               rtol=5e-2, atol=5e-3)


def test_se_resnet_trunk_matches_torch():
    """SE bottleneck (se_resnet_ibn.py:22-63) parity: squeeze-excitation
    after bn3, before the residual add."""
    import jax
    import jax.numpy as jnp

    from dgvcc_tpu.nn.resnet import ResNetTrunk
    from dgvcc_tpu.nn.torch_io import resnet50_to_flax

    rng = np.random.default_rng(14)
    layers = (1, 1)
    sd = synth_resnext_sd(rng, layers=layers, groups=1, base_width=64, se=True)
    params, stats = resnet50_to_flax(sd, num_stages=2, layers=layers)
    trunk = ResNetTrunk(layers=layers, num_stages=2, se=True)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    v = trunk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # graft the converted BN/conv weights, then install the SE weights
    import copy
    p2 = copy.deepcopy(jax.tree_util.tree_map(np.asarray, dict(v["params"])))

    def merge(dst, src):
        for k2, v2 in src.items():
            if k2 in dst and isinstance(v2, dict):
                merge(dst[k2], v2)
            elif k2 in dst and np.shape(dst[k2]) == np.shape(v2):
                dst[k2] = v2

    merge(p2, params)
    for k in range(len(layers)):
        tp = f"layer{k + 1}.0"
        se = p2[f"layer{k + 1}_0"]["se"]
        se["Dense_0"]["kernel"] = sd[f"{tp}.se.fc.0.weight"].T
        se["Dense_1"]["kernel"] = sd[f"{tp}.se.fc.2.weight"].T
    out, _ = trunk.apply({"params": p2, "batch_stats": stats}, jnp.asarray(x))
    golden = torch_resnext_forward(sd, np.transpose(x, (0, 3, 1, 2)),
                                   layers=layers, groups=1, se=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(golden, (0, 2, 3, 1)),
                               rtol=5e-2, atol=5e-3)


@pytest.mark.parametrize("kwargs", [
    dict(ibn_cfg="a"),                                   # resnet_ibn_a
    dict(ibn_cfg="a", groups=4, base_width=8),           # resnext_ibn_a
    dict(ibn_cfg="a", se=True),                          # se_resnet_ibn_a
])
def test_ibn_counter_variants_run(kwargs):
    import jax
    import jax.numpy as jnp

    model = MODELS.build("ibn", layers=(1, 1, 1), **kwargs)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x)
    d = model.apply(v, x)
    assert d.shape == (1, 64, 64, 1)


def test_deep_resnet_geometries():
    """resnet101/152 layer counts (RESNET_LAYERS) build the torchvision
    block structure — verified by parameter-tree block names."""
    from dgvcc_tpu.nn.resnet import RESNET_BLOCK, RESNET_LAYERS

    assert RESNET_LAYERS[101] == (3, 4, 23, 3)
    assert RESNET_LAYERS[152] == (3, 8, 36, 3)
    assert RESNET_BLOCK[101] == RESNET_BLOCK[152] == "bottleneck"


def test_densenet_legacy_key_format_converts():
    """The published torchvision checkpoints use the LEGACY key format
    ('denselayer1.norm.1.weight'); densenet_to_flax must re-key like
    torchvision's densenet._load_state_dict regex does."""
    import re

    from dgvcc_tpu.nn.torch_io import densenet_to_flax

    rng = np.random.default_rng(15)
    sd = synth_densenet_sd(rng)
    legacy_sd = {}
    pat = re.compile(r"(denselayer\d+\.)(norm|conv)([12])(\.)")
    for k, v in sd.items():
        legacy_sd[pat.sub(r"\1\2.\3\4", k)] = v
    assert any(".norm.1." in k for k in legacy_sd)  # really legacy now

    p_new, s_new = densenet_to_flax(sd, num_stages=3)
    p_leg, s_leg = densenet_to_flax(legacy_sd, num_stages=3)
    assert set(map(str, p_new)) == set(map(str, p_leg))
    np.testing.assert_array_equal(
        p_leg["denseblock1_denselayer1_conv1"]["kernel"],
        p_new["denseblock1_denselayer1_conv1"]["kernel"])
    np.testing.assert_array_equal(
        s_leg["denseblock2_denselayer2_norm2"]["mean"],
        s_new["denseblock2_denselayer2_norm2"]["mean"])
