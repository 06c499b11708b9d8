"""Trained-checkpoint migration: reference DGModel state_dict → DGModel.

The reference's users carry trained .pth files; dg_checkpoint_to_flax /
load_reference_dg_checkpoint must reproduce the reference's eval
forward from those weights. Golden: a functional-torch implementation
of DGModel_memcls/final eval (models/models.py:29-273) driven by the
same synthetic state_dict.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from dgvcc_tpu.core.registry import MODELS
import dgvcc_tpu.models  # noqa: F401
from dgvcc_tpu.nn.torch_io import (
    dg_checkpoint_to_flax,
    load_reference_dg_checkpoint,
)
from dgvcc_tpu.nn.vgg import VGG16_CFG, feature_layout

MEM_DIM, MEM_SIZE = 16, 8


def synth_dg_state_dict(rng, with_mem=True, with_cls=True):
    """Random reference-layout DGModel state_dict (torch Sequential
    local indices, ConvBlock .conv/.bn naming)."""
    sd = {}

    def conv(pre, cin, cout, k=3, bias=False):
        sd[f"{pre}.weight"] = rng.normal(0, 0.05, (cout, cin, k, k)).astype(np.float32)
        if bias:
            sd[f"{pre}.bias"] = rng.normal(0, 0.05, cout).astype(np.float32)

    def bn(pre, c):
        sd[f"{pre}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{pre}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{pre}.running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{pre}.running_var"] = rng.uniform(0.5, 2.0, c).astype(np.float32)

    # encoders: torchvision vgg16_bn features sliced into Sequentials —
    # keys use LOCAL indices (enc2.0 is features[23], a pool)
    prev = 3
    for enc, lo, hi in (("enc1", 0, 23), ("enc2", 23, 33), ("enc3", 33, 43)):
        for kind, idx, arg in feature_layout(VGG16_CFG, True):
            if not (lo <= idx < hi):
                continue
            loc = idx - lo
            if kind == "conv":
                conv(f"{enc}.{loc}", prev, arg, bias=True)
                prev = arg
            elif kind == "bn":
                bn(f"{enc}.{loc}", arg)

    def convblock(pre, cin, cout, k=3, with_bn=True):
        conv(f"{pre}.conv", cin, cout, k=k)
        if with_bn:
            bn(f"{pre}.bn", cout)

    convblock("dec3.0", 512, 1024)
    convblock("dec3.1", 1024, 512)
    convblock("dec2.0", 1024, 512)
    convblock("dec2.1", 512, 256)
    convblock("dec1.0", 512, 256)
    convblock("dec1.1", 256, 128)
    den_ch = MEM_DIM if with_mem else 256
    convblock("den_dec.0", 896, den_ch, k=1)
    convblock("den_head.0", den_ch, 1, k=1, with_bn=False)
    if with_mem:
        sd["mem"] = rng.normal(0, 1, (1, MEM_DIM, MEM_SIZE)).astype(np.float32)
    if with_cls:
        convblock("cls_head.0", 512, 256)
        convblock("cls_head.2", 256, 1, k=1, with_bn=False)
    return sd


# ---- functional-torch golden (reference models.py eval path) -------------

def t_convblock(x, sd, pre, pad=1, relu=True):
    w = torch.tensor(sd[f"{pre}.conv.weight"])
    x = TF.conv2d(x, w, padding=pad)
    if f"{pre}.bn.weight" in sd:
        x = TF.batch_norm(
            x, torch.tensor(sd[f"{pre}.bn.running_mean"]),
            torch.tensor(sd[f"{pre}.bn.running_var"]),
            torch.tensor(sd[f"{pre}.bn.weight"]),
            torch.tensor(sd[f"{pre}.bn.bias"]), training=False, eps=1e-5)
    return TF.relu(x) if relu else x


def t_encoder(x, sd):
    feats = []
    for enc, lo, hi in (("enc1", 0, 23), ("enc2", 23, 33), ("enc3", 33, 43)):
        for kind, idx, _ in feature_layout(VGG16_CFG, True):
            if not (lo <= idx < hi):
                continue
            loc = idx - lo
            if kind == "conv":
                x = TF.conv2d(x, torch.tensor(sd[f"{enc}.{loc}.weight"]),
                              torch.tensor(sd[f"{enc}.{loc}.bias"]), padding=1)
            elif kind == "bn":
                x = TF.batch_norm(
                    x, torch.tensor(sd[f"{enc}.{loc}.running_mean"]),
                    torch.tensor(sd[f"{enc}.{loc}.running_var"]),
                    torch.tensor(sd[f"{enc}.{loc}.weight"]),
                    torch.tensor(sd[f"{enc}.{loc}.bias"]),
                    training=False, eps=1e-5)
            elif kind == "relu":
                x = TF.relu(x)
            elif kind == "pool":
                x = TF.max_pool2d(x, 2, 2)
        feats.append(x)
    return feats


def t_up(x, f, mode="bilinear"):
    if mode == "nearest":
        return TF.interpolate(x, scale_factor=f, mode=mode)
    return TF.interpolate(x, scale_factor=f, mode=mode, align_corners=False)


def torch_dg_final_eval(x_np, sd, cls_thrs=0.5):
    """models.py:230-273 (memcls forward, the final eval path)."""
    x = torch.tensor(x_np)
    x1, x2, x3 = t_encoder(x, sd)
    y = t_convblock(t_convblock(x3, sd, "dec3.0"), sd, "dec3.1")
    y3 = y
    y = torch.cat([t_up(y, 2), x2], dim=1)
    y = t_convblock(t_convblock(y, sd, "dec2.0"), sd, "dec2.1")
    y2 = y
    y = torch.cat([t_up(y, 2), x1], dim=1)
    y = t_convblock(t_convblock(y, sd, "dec1.0"), sd, "dec1.1")
    y_cat = torch.cat([y, t_up(y2, 2), t_up(y3, 4)], dim=1)
    y_den = t_convblock(y_cat, sd, "den_dec.0", pad=0)
    # forward_mem (models.py:116-125)
    b, k, h, w = y_den.shape
    m = torch.tensor(sd["mem"]).repeat(b, 1, 1)
    m_key = m.transpose(1, 2)
    y_ = y_den.reshape(b, k, -1)
    logits = torch.bmm(m_key, y_) / np.sqrt(k)
    y_new = torch.bmm(m_key.transpose(1, 2), TF.softmax(logits, dim=1))
    y_den = y_new.reshape(b, k, h, w)
    c = torch.sigmoid(t_convblock(
        t_convblock(x3, sd, "cls_head.0"), sd, "cls_head.2", pad=0,
        relu=False))
    c_bin = torch.where(c >= cls_thrs, 1.0, 0.0)
    d = t_convblock(y_den, sd, "den_head.0", pad=0)
    dc = t_up(d * t_up(c_bin, 4, "nearest"), 4)
    return dc.numpy(), c.numpy()


@pytest.fixture(scope="module")
def converted():
    rng = np.random.default_rng(21)
    sd = synth_dg_state_dict(rng)
    model = MODELS.build("final", mem_size=MEM_SIZE, mem_dim=MEM_DIM)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    variables = load_reference_dg_checkpoint(dict(variables), sd)
    return model, variables, sd, rng


def test_full_model_eval_parity(converted):
    """The migrated checkpoint reproduces the reference eval forward."""
    model, variables, sd, rng = converted
    x = rng.normal(0, 1, (2, 64, 96, 3)).astype(np.float32)
    dc, c = model.apply(variables, jnp.asarray(x))
    dc_t, c_t = torch_dg_final_eval(np.transpose(x, (0, 3, 1, 2)), sd)
    np.testing.assert_allclose(np.asarray(c),
                               np.transpose(c_t, (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dc),
                               np.transpose(dc_t, (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-4)


def test_all_sites_installed(converted):
    """Every converted module landed (no init weights survive)."""
    model, variables, sd, _ = converted
    p, s = dg_checkpoint_to_flax(sd)
    assert set(p) == set(variables["params"])
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["memory"]["mem"]), sd["mem"][0])
    np.testing.assert_array_equal(
        np.asarray(variables["batch_stats"]["dec2_1"]["BatchNorm_0"]["mean"]),
        sd["dec2.1.bn.running_mean"])


def test_pth_drives_trainer_and_serve(tmp_path, converted):
    """A saved reference .pth feeds both the trainer's load_ckpt and
    VideoCounter.from_checkpoint (the user migration entry points)."""
    _, variables, sd, rng = converted
    pth = tmp_path / "trained_reference.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, pth)

    from dgvcc_tpu.serve import VideoCounter

    counter = VideoCounter.from_checkpoint(
        "final", str(pth), dtype=jnp.float32,
        mem_size=MEM_SIZE, mem_dim=MEM_DIM)
    np.testing.assert_array_equal(
        np.asarray(counter.variables["params"]["memory"]["mem"]),
        sd["mem"][0])
    frames = rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)
    counts = counter.count_frames(frames)
    assert np.isfinite(counts).all()

    # trainer path converts for DG models, refuses others clearly
    from dgvcc_tpu.core.config import Config
    from dgvcc_tpu.train.trainer import DGTrainer

    def make_trainer(model):
        cfg = Config.from_dict({
            "seed": 0, "version": f"pth_mig_{model['name']}",
            "log_para": 1000, "patch_size": 1440, "mode": "simple",
            "num_epochs": 1, "checkpoint": None, "model": model,
            "loss": {"name": "mse", "params": {}},
            "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
            "compute_dtype": "float32", "log_dir": str(tmp_path / "logs"),
        })
        t = DGTrainer(cfg)
        t.build()
        return t

    t = make_trainer({"name": "final", "params": {
        "pretrained": False, "mem_size": MEM_SIZE, "mem_dim": MEM_DIM}})
    t.load_ckpt(str(pth))
    np.testing.assert_array_equal(
        np.asarray(t.state.params["memory"]["mem"]), sd["mem"][0])

    # wrong-family .pth fails loudly with a diagnosable message
    t2 = make_trainer({"name": "sasnet", "params": {"pretrained": False}})
    with pytest.raises(ValueError, match="does not match"):
        t2.load_ckpt(str(pth))


def test_variant_mismatch_errors():
    rng = np.random.default_rng(3)
    sd = synth_dg_state_dict(rng, with_mem=True, with_cls=True)
    base = MODELS.build("base")
    x = jnp.zeros((1, 64, 64, 3))
    v = base.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, x)
    with pytest.raises(ValueError, match="memory bank"):
        load_reference_dg_checkpoint(dict(v), sd)

    sd_base = synth_dg_state_dict(rng, with_mem=False, with_cls=False)
    final = MODELS.build("final", mem_size=MEM_SIZE, mem_dim=MEM_DIM)
    vf = final.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, x)
    with pytest.raises(ValueError, match="missing modules"):
        load_reference_dg_checkpoint(dict(vf), sd_base)


# ---- models2 family (gen / reg_mem) --------------------------------------

def _mk_conv(sd, pre, cin, cout, k=3, bias=False, rng=None):
    sd[f"{pre}.weight"] = rng.normal(0, 0.05, (cout, cin, k, k)).astype(np.float32)
    if bias:
        sd[f"{pre}.bias"] = rng.normal(0, 0.05, cout).astype(np.float32)


def _mk_bn(sd, pre, c, rng):
    sd[f"{pre}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
    sd[f"{pre}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
    sd[f"{pre}.running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
    sd[f"{pre}.running_var"] = rng.uniform(0.5, 2.0, c).astype(np.float32)


def _mk_convblock(sd, pre, cin, cout, k=3, with_bn=True, rng=None):
    _mk_conv(sd, f"{pre}.conv", cin, cout, k=k, rng=rng)
    if with_bn:
        _mk_bn(sd, f"{pre}.bn", cout, rng)


def synth_generator_sd(rng):
    """Reference Generator (models2.py:29-56): plain-vgg19[:26] enc +
    dec Sequential with ConvBlocks at 0,1,3,4,5,6,8,9,11,12."""
    from dgvcc_tpu.nn.vgg import VGG19_CFG

    sd = {}
    prev = 3
    for kind, idx, arg in feature_layout(VGG19_CFG, False):
        if idx >= 26:
            break
        if kind == "conv":
            _mk_conv(sd, f"enc.{idx}", prev, arg, bias=True, rng=rng)
            prev = arg
    dec = [(0, 512, 512, 3), (1, 512, 256, 3), (3, 256, 256, 3),
           (4, 256, 256, 3), (5, 256, 256, 3), (6, 256, 128, 3),
           (8, 128, 128, 3), (9, 128, 64, 3), (11, 64, 64, 3),
           (12, 64, 3, 1)]
    for idx, cin, cout, k in dec:
        _mk_convblock(sd, f"dec.{idx}", cin, cout, k=k,
                      with_bn=(idx != 12), rng=rng)
    return sd


def synth_regressor_m_sd(rng):
    """Reference DensityRegressorM (models2.py:189-373)."""
    sd = {}
    prev = 3
    for st, lo, hi in (("stage1", 0, 23), ("stage2", 23, 33),
                       ("stage3", 33, 43)):
        for kind, idx, arg in feature_layout(VGG16_CFG, True):
            if not (lo <= idx < hi):
                continue
            loc = idx - lo
            if kind == "conv":
                _mk_conv(sd, f"{st}.{loc}", prev, arg, bias=True, rng=rng)
                prev = arg
            elif kind == "bn":
                _mk_bn(sd, f"{st}.{loc}", arg, rng)
    for pre, cin, cout in (("dec3.0", 512, 1024), ("dec3.1", 1024, 512),
                           ("dec2.0", 1024, 512), ("dec2.1", 512, 256),
                           ("dec1.0", 512, 256), ("dec1.1", 256, 128)):
        _mk_convblock(sd, pre, cin, cout, rng=rng)
    _mk_convblock(sd, "den_dec.0", 896, 256, k=1, rng=rng)
    _mk_convblock(sd, "den_head", 256, 1, k=1, with_bn=False, rng=rng)
    sd["mem"] = rng.normal(0, 1, (1, 256, 1024)).astype(np.float32)
    _mk_convblock(sd, "cls_head.0", 512, 256, rng=rng)
    _mk_convblock(sd, "cls_head.2", 256, 1, k=1, with_bn=False, rng=rng)
    return sd


def test_generator_checkpoint_converts_and_runs(tmp_path):
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

    rng = np.random.default_rng(31)
    sd = synth_generator_sd(rng)
    model = MODELS.build("gen")
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["dec2_3"]["Conv_0"]["kernel"]),
        np.transpose(sd["dec.6.conv.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(v2["batch_stats"]["dec4"]["BatchNorm_0"]["var"]),
        sd["dec.11.bn.running_var"])
    out = model.apply(v2, jnp.asarray(
        rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)))
    out = np.asarray(out)
    assert np.isfinite(out).all() and out.min() >= -1 and out.max() <= 1


def test_regressor_m_checkpoint_converts_and_runs():
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

    rng = np.random.default_rng(33)
    sd = synth_regressor_m_sd(rng)
    model = MODELS.build("reg_mem")
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    assert set(v2["params"]) == set(v["params"])
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["memory"]["mem"]), sd["mem"][0])
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["fe"]["stage2"]["conv24"]["kernel"]),
        np.transpose(sd["stage2.1.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(v2["batch_stats"]["fe"]["dec1_1"]["BatchNorm_0"]["mean"]),
        sd["dec1.1.bn.running_mean"])
    dc, c = model.apply(v2, jnp.asarray(
        rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)))
    assert np.isfinite(np.asarray(dc)).all()


def test_joint_pair_pth_checkpoints(tmp_path):
    """stb_joint.yml-style checkpoint: [gen.pth, reg.pth] — both convert
    through the trainer's pair branch."""
    from dgvcc_tpu.core.config import Config
    from dgvcc_tpu.train.trainer import DGTrainer

    rng = np.random.default_rng(35)
    gen_sd = synth_generator_sd(rng)
    reg_sd = synth_regressor_m_sd(rng)
    gp, rp = tmp_path / "gen.pth", tmp_path / "reg.pth"
    torch.save({k: torch.tensor(v) for k, v in gen_sd.items()}, gp)
    torch.save({k: torch.tensor(v) for k, v in reg_sd.items()}, rp)

    cfg = Config.from_dict({
        "seed": 0, "version": "pair_pth", "log_para": 1000,
        "patch_size": 1440, "mode": "joint", "num_epochs": 1,
        "checkpoint": [str(gp), str(rp)],
        "model": {"name": "dgnet", "params": {}},
        "loss": {"name": "mse", "params": {}},
        "optimizer": {"name": "adam", "params": {"lr": 1e-4}},
        "compute_dtype": "float32", "log_dir": str(tmp_path / "logs"),
    })
    t = DGTrainer(cfg)
    t.build()
    t.load_ckpt(cfg.checkpoint)
    np.testing.assert_array_equal(
        np.asarray(t.state.params["memory"]["mem"]), reg_sd["mem"][0])
    np.testing.assert_array_equal(
        np.asarray(t.gen_state.params["dec0"]["Conv_0"]["kernel"]),
        np.transpose(gen_sd["dec.0.conv.weight"], (2, 3, 1, 0)))


# ---- classic baselines ----------------------------------------------------

def test_csrnet_checkpoint_converts_and_runs():
    from dgvcc_tpu.models.baselines.csrnet import BACKEND, FRONTEND
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

    rng = np.random.default_rng(41)
    sd = {}
    prev = 3
    for prefix, cfg, dil in (("frontend", FRONTEND, 1), ("backend", BACKEND, 2)):
        seq = 0
        for v in cfg:
            if v == "M":
                seq += 1
                continue
            _mk_conv(sd, f"{prefix}.{seq}", prev, v, bias=True, rng=rng)
            prev = v
            seq += 2
    _mk_conv(sd, "output_layer", 64, 1, k=1, bias=True, rng=rng)

    model = MODELS.build("csrnet")
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    assert set(v2["params"]) == set(v["params"])
    # frontend conv2 is the 3rd conv = cfg (64,64,M,128,...) seq index 5
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["frontend"]["conv2"]["kernel"]),
        np.transpose(sd["frontend.5.weight"], (2, 3, 1, 0)))
    out = model.apply(v2, jnp.asarray(
        rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)))
    assert np.isfinite(np.asarray(out)).all()


def test_mcnn_checkpoint_converts_and_runs():
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

    rng = np.random.default_rng(43)
    sd = {}
    specs = {"branch1": ((16, 9), (32, 7), (16, 7), (8, 7)),
             "branch2": ((20, 7), (40, 5), (20, 5), (10, 5)),
             "branch3": ((24, 5), (48, 3), (24, 3), (12, 3))}
    for b, chain in specs.items():
        prev = 3
        for (c, k), seq in zip(chain, (0, 3, 6, 8)):
            _mk_conv(sd, f"{b}.{seq}", prev, c, k=k, bias=True, rng=rng)
            prev = c
    _mk_conv(sd, "fuse.0", 30, 1, k=1, bias=True, rng=rng)

    model = MODELS.build("mcnn")
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["branch2"]["conv1"]["kernel"]),
        np.transpose(sd["branch2.3.weight"], (2, 3, 1, 0)))
    out = model.apply(v2, jnp.asarray(
        rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)))
    assert np.isfinite(np.asarray(out)).all()


def test_bl_checkpoint_converts_and_runs():
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint
    from dgvcc_tpu.nn.vgg import VGG19_CFG

    rng = np.random.default_rng(45)
    sd = {}
    prev = 3
    for kind, idx, arg in feature_layout(VGG19_CFG, False):
        if idx >= len(VGG19_CFG) and False:
            break
        if kind == "conv":
            _mk_conv(sd, f"features.{idx}", prev, arg, bias=True, rng=rng)
            prev = arg
    _mk_conv(sd, "reg_layer.0", 512, 256, bias=True, rng=rng)
    _mk_conv(sd, "reg_layer.2", 256, 128, bias=True, rng=rng)
    _mk_conv(sd, "reg_layer.4", 128, 1, k=1, bias=True, rng=rng)

    model = MODELS.build("bl")
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["reg2"]["kernel"]),
        np.transpose(sd["reg_layer.2.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["features"]["conv10"]["bias"]),
        sd["features.10.bias"])
    out = model.apply(v2, jnp.asarray(
        rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)))
    out = np.asarray(out)
    assert np.isfinite(out).all() and (out >= 0).all()  # |abs| head


# ---- whitening counters (sw / ibn / isw) ---------------------------------

def _mk_bottlenecks(sd, stage_prefix, k, n_blocks, inplanes, rng,
                    sw_odd=False, post_in_last=False):
    """Synth torch Bottleneck stage k (planes 64*2^k) under
    '{stage_prefix}.{i}.'; returns the stage's output channels."""
    planes = 64 * (2 ** k)
    for i in range(n_blocks):
        pre = f"{stage_prefix}.{i}"
        _mk_conv(sd, f"{pre}.conv1", inplanes if i == 0 else planes * 4,
                 planes, k=1, rng=rng)
        _mk_conv(sd, f"{pre}.conv2", planes, planes, k=3, rng=rng)
        _mk_conv(sd, f"{pre}.conv3", planes, planes * 4, k=1, rng=rng)
        _mk_bn(sd, f"{pre}.bn1", planes, rng)
        if sw_odd and i != 0 and i % 2 == 1:
            _mk_sw(sd, f"{pre}.sw2", planes, rng)
        else:
            _mk_bn(sd, f"{pre}.bn2", planes, rng)
        _mk_bn(sd, f"{pre}.bn3", planes * 4, rng)
        if i == 0:
            _mk_conv(sd, f"{pre}.downsample.0", inplanes, planes * 4, k=1,
                     rng=rng)
            _mk_bn(sd, f"{pre}.downsample.1", planes * 4, rng)
        if post_in_last and i == n_blocks - 1:
            sd[f"{pre}.IN.weight"] = rng.uniform(0.5, 1.5, planes * 4).astype(np.float32)
            sd[f"{pre}.IN.bias"] = rng.normal(0, 0.1, planes * 4).astype(np.float32)
    return planes * 4


def _mk_sw(sd, pre, c, rng, num_pergroup=16):
    g = c // num_pergroup
    sd[f"{pre}.sw_mean_weight"] = rng.uniform(0.5, 1.5, 2).astype(np.float32)
    sd[f"{pre}.sw_var_weight"] = rng.uniform(0.5, 1.5, 2).astype(np.float32)
    sd[f"{pre}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
    sd[f"{pre}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
    sd[f"{pre}.running_mean"] = rng.normal(0, 0.1, (g, num_pergroup, 1)).astype(np.float32)
    eye = np.eye(num_pergroup, dtype=np.float32)[None].repeat(g, axis=0)
    sd[f"{pre}.running_cov"] = eye + rng.uniform(0, 0.05, (g, num_pergroup, num_pergroup)).astype(np.float32)


def _mk_head(sd, rng, prefix="head"):
    _mk_conv(sd, f"{prefix}.0", 1024, 512, bias=True, rng=rng)
    _mk_conv(sd, f"{prefix}.2", 512, 256, bias=True, rng=rng)
    _mk_conv(sd, f"{prefix}.4", 256, 1, k=1, bias=True, rng=rng)


def test_sw_counter_checkpoint_converts_and_runs():
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

    rng = np.random.default_rng(61)
    layers = (1, 2, 1)  # stage 2 has an odd block → exercises sw2
    sd = {}
    _mk_conv(sd, "backbone.0", 3, 64, k=7, rng=rng)
    _mk_sw(sd, "backbone.1", 64, rng)
    inp = 64
    for k, n in enumerate(layers):
        inp = _mk_bottlenecks(sd, f"backbone.{4 + k}", k, n, inp, rng,
                              sw_odd=True)
    # the reference head consumes layer3 output (1024 for resnet50); the
    # tiny-geometry head keeps the real channel plan
    _mk_head(sd, rng)

    model = MODELS.build("sw", layers=layers)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    assert set(v2["params"]["backbone"]) == set(v["params"]["backbone"])
    # the odd block's SW site landed verbatim
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["backbone"]["layer2_1"]["bn2"]["sw_mean_weight"]),
        sd["backbone.5.1.sw2.sw_mean_weight"])
    np.testing.assert_array_equal(
        np.asarray(v2["batch_stats"]["backbone"]["bn1"]["running_cov"]),
        sd["backbone.1.running_cov"])
    out = model.apply(v2, jnp.asarray(
        rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)))
    assert np.isfinite(np.asarray(out)).all()


def test_ibn_counter_checkpoint_converts_and_runs():
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

    rng = np.random.default_rng(63)
    layers = (2, 1, 1)
    sd = {}
    _mk_conv(sd, "backbone.0", 3, 64, k=7, rng=rng)
    sd["backbone.1.weight"] = rng.uniform(0.5, 1.5, 64).astype(np.float32)
    sd["backbone.1.bias"] = rng.normal(0, 0.1, 64).astype(np.float32)
    inp = 64
    for k, n in enumerate(layers):
        inp = _mk_bottlenecks(sd, f"backbone.{4 + k}", k, n, inp, rng,
                              post_in_last=(k < 2))
    _mk_head(sd, rng)

    model = MODELS.build("ibn", layers=layers)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    assert set(v2["params"]["backbone"]) == set(v["params"]["backbone"])
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["backbone"]["layer1_1"]["post_in"]["scale"]),
        sd["backbone.4.1.IN.weight"])
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["backbone"]["bn1"]["scale"]),
        sd["backbone.1.weight"])
    out = model.apply(v2, jnp.asarray(
        rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)))
    assert np.isfinite(np.asarray(out)).all()


def test_isw_counter_checkpoint_converts_and_runs():
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

    rng = np.random.default_rng(65)
    layers = (1, 1, 1)
    sd = {}
    _mk_conv(sd, "layer0.0", 3, 64, k=7, rng=rng)
    inp = 64
    for k, n in enumerate(layers):
        inp = _mk_bottlenecks(sd, f"layer{k + 1}", k, n, inp, rng)
    # unused layer4 keys must be ignored, like the reference forward
    _mk_bottlenecks(sd, "layer4", 3, 1, inp, rng)
    _mk_head(sd, rng)

    model = MODELS.build("isw", layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    assert set(v2["params"]["net"]["backbone"]) == set(v["params"]["net"]["backbone"])
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["net"]["backbone"]["layer2_0"]["conv2"]["kernel"]),
        np.transpose(sd["layer2.0.conv2.weight"], (2, 3, 1, 0)))
    out = model.apply(v2, jnp.asarray(
        rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)))
    assert np.isfinite(np.asarray(out)).all()


# ---- SASNet / CCTrans ----------------------------------------------------

def test_sasnet_checkpoint_converts_and_runs():
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

    rng = np.random.default_rng(71)
    sd = {}
    # shared vgg16_bn stages, Sequential-local keys
    prev = 3
    for st, lo, hi in (("features1", 0, 6), ("features2", 6, 13),
                       ("features3", 13, 23), ("features4", 23, 33),
                       ("features5", 33, 43)):
        for kind, idx, arg in feature_layout(VGG16_CFG, True):
            if not (lo <= idx < hi):
                continue
            loc = idx - lo
            if kind == "conv":
                _mk_conv(sd, f"{st}.{loc}", prev, arg, bias=True, rng=rng)
                prev = arg
            elif kind == "bn":
                _mk_bn(sd, f"{st}.{loc}", arg, rng)
    # de_pred chains (conv+bias, no bn)
    de_plan = {5: (512, 1024, 512), 4: (1024, 512, 256),
               3: (512, 256, 128), 2: (256, 128, 64), 1: (128, 64, 64)}
    for n, (cin, mid, cout) in de_plan.items():
        _mk_conv(sd, f"de_pred{n}.0.conv", cin, mid, bias=True, rng=rng)
        _mk_conv(sd, f"de_pred{n}.1.conv", mid, cout, bias=True, rng=rng)
    # heads per scale: MultiBranchModule(c) + 1x1 density conv; conf pair
    mb_c = {5: 512, 4: 256, 3: 128, 2: 64, 1: 64}
    conf_mid = {5: 256, 4: 128, 3: 64, 2: 32, 1: 32}
    branch_specs = (("branch1x1", 1, False), ("branch1x1_1", 1, True),
                    ("branch3x3_1", 1, False), ("branch3x3_2", 3, True),
                    ("branch3x3dbl_1", 1, False), ("branch3x3dbl_2", 5, True))
    for n, c in mb_c.items():
        for br, k, full in branch_specs:
            cin = c if not full else c // 2
            cout = c if full else c // 2
            _mk_conv(sd, f"density_head{n}.0.{br}.conv", cin, cout, k=k,
                     rng=rng)
            _mk_bn(sd, f"density_head{n}.0.{br}.bn", cout, rng)
        _mk_conv(sd, f"density_head{n}.1.conv", 4 * c, 1, k=1, bias=True,
                 rng=rng)
        _mk_conv(sd, f"confidence_head{n}.0.conv", c, conf_mid[n], k=1,
                 bias=True, rng=rng)
        _mk_conv(sd, f"confidence_head{n}.1.conv", conf_mid[n], 1, k=1,
                 bias=True, rng=rng)

    model = MODELS.build("sasnet")
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    assert set(v2["params"]) == set(v["params"])
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["ConvRelu_2"]["Conv_0"]["kernel"]),
        np.transpose(sd["de_pred4.0.conv.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["MultiBranch_1"]["BasicConv_3"]["Conv_0"]["kernel"]),
        np.transpose(sd["density_head4.0.branch3x3_2.conv.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["ConvRelu_13"]["Conv_0"]["bias"]),
        sd["confidence_head4.1.conv.bias"])
    out = model.apply(v2, jnp.asarray(
        rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)))
    assert np.isfinite(np.asarray(out)).all()


def test_cctrans_checkpoint_converts_and_runs():
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

    rng = np.random.default_rng(73)
    dims = (16, 32, 64, 128)
    heads = (2, 4, 8, 16)
    depths = (2, 1, 1, 1)  # k=0,i=1 exercises global attention + sr
    sr = (8, 4, 2, 1)
    sd = {}

    def dense(pre, i, o):
        sd[f"{pre}.weight"] = rng.normal(0, 0.05, (o, i)).astype(np.float32)
        sd[f"{pre}.bias"] = rng.normal(0, 0.05, o).astype(np.float32)

    def lnorm(pre, c):
        sd[f"{pre}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{pre}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)

    prev = 3
    for k, e in enumerate(dims):
        patch = 4 if k == 0 else 2
        _mk_conv(sd, f"patch_embeds.{k}.proj", prev, e, k=patch, bias=True,
                 rng=rng)
        lnorm(f"patch_embeds.{k}.norm", e)
        # depthwise PEG conv (C,1,3,3)
        sd[f"pos_block.{k}.proj.0.weight"] = rng.normal(
            0, 0.05, (e, 1, 3, 3)).astype(np.float32)
        sd[f"pos_block.{k}.proj.0.bias"] = rng.normal(0, 0.05, e).astype(np.float32)
        for i in range(depths[k]):
            pre = f"blocks.{k}.{i}"
            lnorm(f"{pre}.norm1", e)
            lnorm(f"{pre}.norm2", e)
            dense(f"{pre}.mlp.fc1", e, e * 4)
            dense(f"{pre}.mlp.fc2", e * 4, e)
            if i % 2 == 0:  # window attention
                dense(f"{pre}.attn.qkv", e, e * 3)
            else:  # global sub-sampled
                dense(f"{pre}.attn.q", e, e)
                dense(f"{pre}.attn.kv", e, e * 2)
                if sr[k] > 1:
                    _mk_conv(sd, f"{pre}.attn.sr", e, e, k=sr[k], bias=True,
                             rng=rng)
                    lnorm(f"{pre}.attn.norm", e)
            dense(f"{pre}.attn.proj", e, e)
        prev = e
    # Regression head (CCTrans.py:16-61 channel plan, inputs = stages 2/3/4)
    for name, cin in (("v1", dims[1]), ("v2", dims[2]), ("v3", dims[3])):
        ci = 0 if name == "v1" else 1
        _mk_conv(sd, f"regression.{name}.{ci}", cin, 256, bias=True, rng=rng)
        _mk_bn(sd, f"regression.{name}.{ci + 1}", 256, rng)
    for name, cout, k in (("stage1", 128, 3), ("stage2", 128, 3),
                          ("stage3", 128, 3), ("stage4", 384, 1)):
        _mk_conv(sd, f"regression.{name}.0", 256, cout, k=k, bias=True,
                 rng=rng)
        _mk_bn(sd, f"regression.{name}.1", cout, rng)
    _mk_conv(sd, "regression.res.0", 384, 64, bias=True, rng=rng)
    _mk_bn(sd, "regression.res.1", 64, rng)
    _mk_conv(sd, "regression.res.3", 64, 1, k=1, bias=True, rng=rng)

    model = MODELS.build("cctrans", embed_dims=dims, num_heads=heads,
                         depths=depths, wss=(2, 2, 2, 2), sr_ratios=sr)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, train=False)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    assert set(v2["params"]) == set(v["params"])
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["block0_1"]["attn"]["q"]["kernel"]),
        sd["blocks.0.1.attn.q.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["regression"]["stage2_bn"]["scale"]),
        sd["regression.stage2.1.weight"])
    out = model.apply(v2, jnp.asarray(
        rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)))
    out = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(out)).all()


def test_dssinet_checkpoint_converts_and_runs():
    from dgvcc_tpu.nn.torch_io import load_reference_checkpoint

    rng = np.random.default_rng(75)
    sd = {}
    fe = "front_end.features"

    def prelu(pre):
        sd[f"{pre}.weight"] = rng.uniform(0.1, 0.4, 1).astype(np.float32)

    # cfg 'F' make_layers names: convs + 'relu{i}' PReLUs (incl. the
    # relu8/relu15 sites the reference forward never crosses)
    chans = {"0": (3, 64), "2": (64, 64), "5": (64, 128), "7": (128, 128),
             "10": (128, 256), "12": (256, 256), "14": (256, 256),
             "17": (256, 512), "19": (512, 512), "21": (512, 512)}
    for idx, (cin, cout) in chans.items():
        _mk_conv(sd, f"{fe}.{idx}", cin, cout, bias=True, rng=rng)
    for r in ("relu1", "relu3", "relu6", "relu8", "relu11", "relu13",
              "relu15", "relu18", "relu20", "relu22"):
        prelu(f"{fe}.{r}")

    ncs = {1: [128, 64], 2: [256, 128, 64], 3: [512, 256, 128],
           4: [512, 256]}
    for k, cs in ncs.items():
        prelu(f"passing{k}.prelu")
        for i in range(len(cs)):
            for j in range(len(cs)):
                if i == j:
                    continue
                _mk_conv(sd, f"passing{k}.w_0_{j}_{i}_0.0.conv", cs[j],
                         cs[i], k=1, bias=True, rng=rng)
    dec_in = {1: 512, 2: 768, 3: 896, 4: 448, 5: 192}
    for k, cin in dec_in.items():
        _mk_conv(sd, f"decoder{k}.0.conv", cin, 128, k=1, bias=True, rng=rng)
        _mk_conv(sd, f"decoder{k}.1.conv", 128, 1, k=3, bias=True, rng=rng)
    for k in range(1, 5):
        _mk_conv(sd, f"passing_weight{k}.conv", 1, 1, k=3, bias=True, rng=rng)
    prelu("prelu")

    model = MODELS.build("dssinet")
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v2 = load_reference_checkpoint(dict(v), sd, model)
    assert set(v2["params"]) == set(v["params"])
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["stage3"]["conv1"]["kernel"]),
        np.transpose(sd[f"{fe}.12.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["stage1_act"]["alpha"]),
        sd[f"{fe}.relu3.weight"])
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["passing2"]["w_0_2_0_0"]["kernel"]),
        np.transpose(sd["passing2.w_0_2_0_0.0.conv.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["out_prelu"]["alpha"]), sd["prelu.weight"])
    out = model.apply(v2, jnp.asarray(
        rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)))
    assert np.isfinite(np.asarray(out)).all()
