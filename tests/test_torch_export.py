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
               init_kwargs=None, shape=(1, 64, 64, 3)):
    sd = randomize_state_dict(ref, seed)
    template = randomize_state_dict(ref, seed + 1)
    model = MODELS.build(name, **(build_kwargs or {}))
    rngdict = {r: jax.random.PRNGKey(i) for i, r in enumerate(rngs)}
    v = model.init(rngdict, jnp.zeros(shape, jnp.float32),
                   **(init_kwargs or {}))
    v2 = load_reference_checkpoint(dict(v), sd, model)
    out = export_reference_checkpoint(v2, template, model)

    assert set(out) == set(sd)
    consumed = total = 0
    for k in sd:
        a, orig, tmp = (np.asarray(out[k]), np.asarray(sd[k]),
                        np.asarray(template[k]))
        total += a.size
        if np.array_equal(a, orig):
            consumed += a.size
        else:
            # untouched by the converter → template passthrough, exactly
            assert np.array_equal(a, tmp), (
                f"{k}: export matches neither the imported weights nor "
                "the template")
    # the converters consume (nearly) the whole checkpoint; anything
    # big left over would mean a silently unmapped module
    assert consumed / total > 0.95, f"only {consumed}/{total} round-tripped"
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


@pytest.mark.heavy
def test_dg_final_export_roundtrip():
    MM = ref_import("models.models")
    ref = MM.DGModel_final(pretrained=False)
    _roundtrip("final", ref, 305, rngs=("params", "dropout"))


@pytest.mark.heavy
def test_ibn_export_roundtrip():
    # IBN-a splits BN params channel-wise into IN/BN halves — the probe
    # must recover the interleaved inverse exactly
    IB = ref_import("models.ibnnet")
    ref = IB.IBNCounter_ResNet()
    _roundtrip("ibn", ref, 307, init_kwargs={"train": False})


@pytest.mark.heavy
def test_dssinet_export_roundtrip():
    # shared VGG pyramid: several flax sites export into the same torch
    # keys — values agree, the conflict check must accept them
    DS = ref_import("models.baselines.DSSINet")
    ref = DS.CRFVGG()
    _roundtrip("dssinet", ref, 309, init_kwargs={"train": False})
