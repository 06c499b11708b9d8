"""End-to-end train-step tests: loss decreases, shard_map parallel step
runs on the virtual 8-device CPU mesh and matches the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvcc_tpu.core.registry import MODELS, LOSSES
import dgvcc_tpu.models  # noqa: F401
import dgvcc_tpu.losses  # noqa: F401
from dgvcc_tpu.train.state import create_train_state
from dgvcc_tpu.train.steps import build_train_step, jit_train_step
from dgvcc_tpu.train.optim import build_optimizer
from dgvcc_tpu.parallel import make_mesh, shard_batch, build_parallel_train_step
from dgvcc_tpu.parallel.mesh import replicate

H = W = 32
B = 8


def synth_batch(rng, with_second_view=True, with_bmap=True):
    batch = {
        "img1": rng.normal(size=(B, H, W, 3)).astype(np.float32),
        "dmap": rng.uniform(0, 0.01, size=(B, H, W, 1)).astype(np.float32),
    }
    if with_second_view:
        batch["img2"] = batch["img1"] + 0.1 * rng.normal(size=(B, H, W, 3)).astype(np.float32)
    if with_bmap:
        batch["bmap"] = (rng.uniform(size=(B, H // 16, W // 16, 1)) > 0.5).astype(np.float32)
    return batch


def make_state(name, tx=None, **params):
    model = MODELS.build(name, **params)
    tx = tx or build_optimizer({"name": "adamw", "params": {"lr": 1e-4}})
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), tx
    )
    return model, state


@pytest.mark.parametrize("mode,model_name", [
    ("simple", "base"),
    ("base", "base"),
    ("add", "memadd"),
    ("cls", "cls"),
    ("final", "final"),
])
def test_train_step_runs_and_learns(mode, model_name):
    model, state = make_state(model_name)
    loss = LOSSES.build("mse")
    step = jit_train_step(build_train_step(model, loss, mode, log_para=1000.0))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in synth_batch(rng).items()}
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i), jnp.int32(0))
        losses.append(float(metrics["loss_total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # same batch thrice → must improve


class _PlainConvNet:
    """BN/dropout-free toy counter: grads are linear in the batch, so
    pmean-of-shard-grads == full-batch grads exactly."""

    def __new__(cls):
        from flax import linen as nn

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = False):
                x = nn.Conv(8, (3, 3), padding=1)(x)
                x = nn.relu(x)
                x = nn.Conv(1, (1, 1))(x)
                return x

        return Net()


def test_parallel_step_exact_on_linear_model():
    mesh = make_mesh(8)
    model = _PlainConvNet()
    tx = build_optimizer({"name": "sgd", "params": {"lr": 0.1}})
    state = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), tx)
    loss = LOSSES.build("mse")

    rng = np.random.default_rng(1)
    batch_np = synth_batch(rng, with_second_view=False, with_bmap=False)

    single = jit_train_step(build_train_step(model, loss, "simple", 1000.0), donate=False)
    state_s, m_s = single(state, {k: jnp.asarray(v) for k, v in batch_np.items()},
                          jax.random.PRNGKey(42), jnp.int32(0))

    par = build_parallel_train_step(model, loss, "simple", 1000.0, mesh, donate=False)
    state_p, m_p = par(replicate(mesh, state), shard_batch(mesh, batch_np),
                       jax.random.PRNGKey(42), jnp.int32(0))

    assert float(m_p["loss_total"]) == pytest.approx(float(m_s["loss_total"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(state_s.params), jax.tree.leaves(jax.device_get(state_p.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_parallel_step_dg_model_runs_and_stays_replicated():
    """Full DG 'final' mode under shard_map: runs, finite, and the
    updated state is identical on every device (grads were pmean'd)."""
    mesh = make_mesh(8)
    model, state = make_state("final")
    loss = LOSSES.build("mse")
    par = build_parallel_train_step(model, loss, "final", 1000.0, mesh, donate=False)

    rng = np.random.default_rng(2)
    batch = shard_batch(mesh, synth_batch(rng))
    state_p, metrics = par(replicate(mesh, state), batch,
                           jax.random.PRNGKey(0), jnp.int32(0))
    assert np.isfinite(float(metrics["loss_total"]))
    # replicated output sharding → a fully-addressable single array per leaf
    leaf = jax.tree.leaves(state_p.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_scheduler_lr_injection():
    model, state = make_state("base")
    state2 = state.set_learning_rate(3e-3)
    assert float(state2.opt_state.hyperparams["learning_rate"]) == pytest.approx(3e-3)


def test_sharded_tile_counting_matches_single_device():
    """Mesh-sharded tiled counting == single-device TiledCounter count."""
    from dgvcc_tpu.ops.tiling import tile_image, TiledCounter
    from dgvcc_tpu.parallel.eval import build_sharded_tile_counter

    mesh = make_mesh(8)
    model, state = make_state("base")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def apply_fn(v, tiles):
        return model.apply(v, tiles)

    rng = np.random.default_rng(3)
    img = rng.normal(size=(70, 90, 3)).astype(np.float32)
    tiles, masks, _, _ = tile_image(img, 32)

    sharded_count = build_sharded_tile_counter(apply_fn, 1000.0, mesh)
    c_sharded = sharded_count(variables, tiles, masks)

    tc = TiledCounter(apply_fn, 1000.0, patch_size=32)
    c_single = tc.count(variables, img)
    assert c_sharded == pytest.approx(c_single, rel=1e-4)


def test_memory_attention_tensor_parallel_exact():
    """Prototype-sharded TP attention == single-device einsum exactly."""
    from jax.sharding import Mesh
    from dgvcc_tpu.parallel.tp import memory_attention_tp, shard_memory, MODEL_AXIS
    from dgvcc_tpu.ops.mem_attention import memory_attention_reference

    devices = np.asarray(jax.devices()[:8])
    mesh = Mesh(devices, (MODEL_AXIS,))

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(2, 96, 64)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(64, 256)).astype(np.float32))

    golden = np.asarray(memory_attention_reference(y, mem))
    tp_fn = memory_attention_tp(mesh)
    out = np.asarray(tp_fn(y, shard_memory(mesh, mem)))
    np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-5)


def test_sharded_tiled_counter_matches_single_device():
    """The trainer's mesh eval counter (ShardedTiledCounter) == the
    single-device TiledCounter on both the tiled and whole-image paths."""
    from dgvcc_tpu.ops.tiling import TiledCounter
    from dgvcc_tpu.parallel.eval import ShardedTiledCounter

    mesh = make_mesh(8)
    model, state = make_state("base")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def apply_fn(v, tiles):
        return model.apply(v, tiles)

    sc = ShardedTiledCounter(apply_fn, 1000.0, 32, mesh)
    tc = TiledCounter(apply_fn, 1000.0, patch_size=32)
    rng = np.random.default_rng(5)
    for shape in ((70, 90, 3), (20, 24, 3)):  # tiled + whole-image
        img = rng.normal(size=shape).astype(np.float32)
        assert sc.count(variables, img) == pytest.approx(
            tc.count(variables, img), rel=1e-4)
    # vis path delegates to the single-device stitcher
    img = rng.normal(size=(70, 90, 3)).astype(np.float32)
    np.testing.assert_allclose(sc.density_map(variables, img),
                               tc.density_map(variables, img), rtol=1e-5)


# ---- classic baselines: full fused train step (simple mode) ------------

# lane membership (sasnet/dssinet/cctrans heavy) is governed by
# conftest's HEAVY nodeid list, not by marks
_BASELINE_TRAIN = [
    # name, build_kwargs, input hw
    ("csrnet", {"pretrained": False}, 64),
    ("mcnn", {}, 64),
    ("bl", {"pretrained": False}, 64),
    ("sasnet", {"pretrained": False}, 64),
    ("dssinet", {}, 64),
    ("cctrans", dict(embed_dims=(32, 64, 128, 256), num_heads=(2, 2, 2, 2),
                     depths=(1, 1, 1, 1), wss=(2, 2, 2, 2),
                     sr_ratios=(8, 4, 2, 1), head_dims=(64, 128, 256)),
     64),
]


@pytest.mark.parametrize("name,bk,hw", _BASELINE_TRAIN,
                         ids=[r[0] for r in _BASELINE_TRAIN])
def test_baseline_train_step_runs_and_learns(name, bk, hw):
    """The reference trains every classic baseline through BaseTrainer's
    forward+MSE+backward (trainers/basetrainer.py:86-125); here that is
    mode 'simple' — one fused jitted program. Each family must run the
    full step (incl. BN/LN mutation and dropout rngs) and reduce the
    loss on a fixed batch."""
    rng = np.random.default_rng(42)
    model = MODELS.build(name, **bk)
    x = jnp.zeros((1, hw, hw, 3), jnp.float32)
    tx = build_optimizer({"name": "adamw", "params": {"lr": 1e-4}})
    state = create_train_state(model, jax.random.PRNGKey(0), x, tx)
    loss = LOSSES.build("mse")
    step = jit_train_step(build_train_step(model, loss, "simple", 1000.0),
                          donate=False)

    # density target shaped like the model's own output resolution
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = model.apply(variables, jnp.zeros((2, hw, hw, 3)), train=False,
                      rngs={"dropout": jax.random.PRNGKey(9)})
    if isinstance(out, tuple):
        out = out[0]
    batch = {
        "img1": jnp.asarray(rng.normal(size=(2, hw, hw, 3)), jnp.float32),
        "dmap": jnp.asarray(rng.uniform(0, 0.01, out.shape), jnp.float32),
    }
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i),
                              jnp.int32(0))
        losses.append(float(metrics["loss_total"]))
    assert np.all(np.isfinite(losses)), losses
    # gradients flow and at least one update improves the fixed batch
    # (strict monotonicity is optimizer noise at random init)
    assert min(losses[1:]) < losses[0], losses


def test_step_is_scan_carry_safe_for_stat_free_models():
    """Regression: a model with NO batch_stats collection must yield a
    TrainState whose batch_stats ({}, plain dict) has the SAME pytree
    type as what a mutable=["batch_stats"] apply returns — otherwise
    lax.scan over train steps (bench harnesses, compiled multi-step
    epochs) fails with a carry-structure TypeError. Caught live by
    scripts/bench_debt.py on the csrnet train row."""
    model = _PlainConvNet()
    tx = build_optimizer({"name": "adamw", "params": {"lr": 1e-3}})
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 16, 3)), tx)
    assert type(state.batch_stats) is dict
    step = build_train_step(model, LOSSES.build("mse"), "simple", 1000.0)
    batch = {
        "img1": jnp.ones((2, 16, 16, 3)),
        "dmap": jnp.full((2, 16, 16, 1), 1e-3),
    }

    @jax.jit
    def three_steps(state):
        def body(s, i):
            s, m = step(s, batch, jax.random.fold_in(jax.random.PRNGKey(1), i),
                        jnp.int32(0))
            return s, m["loss_total"]
        return jax.lax.scan(body, state, jnp.arange(3))

    state, losses = three_steps(state)
    assert np.all(np.isfinite(np.asarray(losses)))
