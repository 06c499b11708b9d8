"""DSSINet (CRFVGG) — multi-scale CRF message passing counter.

Reference models/baselines/DSSINet.py:285-417: a SHARED VGG16-PReLU
front-end (cfg 'F', DSSINet.py:223) applied to a 3-level image pyramid
(x2, x1, x0.5); after each conv stage the scale branches exchange
information through 2-iteration CRF-style MessagePassing (1x1 convs
between branches, PReLU on the binary term, ReLU on unary+binary);
stage aggregations are decoded to densities and fused coarse→fine with
x2 bilinear upsampling + 3x3 passing weights. Output: full resolution.

The reference wraps forward in torch.cuda.amp.autocast (DSSINet.py:342);
here precision is the model dtype (bf16 on TPU by default via config).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgvcc_tpu.core.registry import MODELS
from dgvcc_tpu.nn.layers import upsample


class PReLU(nn.Module):
    """torch nn.PReLU(): one shared learnable negative slope, init 0.25."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class _Stage(nn.Module):
    """One VGG stage: [pool] + convs with PReLU between, NO final act
    (the '_na' sub-forwards of DSSINet.py:344-352 — the final activation
    is applied by the message-passing relu)."""

    chans: Sequence[int]
    pool: bool = True
    final_act: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.pool:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i, c in enumerate(self.chans):
            x = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                        name=f"conv{i}")(x)
            if i < len(self.chans) - 1 or self.final_act:
                x = PReLU(name=f"prelu{i}")(x)
        return x


class MessagePassing(nn.Module):
    """2-iteration pairwise message passing (DSSINet.py:243-283)."""

    branch_n: int
    iters: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, states: List[jnp.ndarray]):
        prelu = PReLU(name="prelu")
        convs = {}
        for i in range(self.branch_n):
            for j in range(self.branch_n):
                if i == j:
                    continue
                convs[(j, i)] = nn.Conv(
                    states[i].shape[-1], (1, 1), dtype=self.dtype,
                    name=f"w_0_{j}_{i}_0",
                )
        hidden = list(states)
        for _ in range(self.iters):
            new = []
            for i in range(self.branch_n):
                binary = None
                for j in range(self.branch_n):
                    if i == j:
                        continue
                    msg = convs[(j, i)](hidden[j])
                    binary = msg if binary is None else binary + msg
                binary = prelu(binary)
                new.append(nn.relu(hidden[i] + binary))
            hidden = new
        return hidden


class _Decoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(128, (1, 1), dtype=self.dtype, name="c1")(x)
        x = nn.relu(x)
        return nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="c2")(x)


def _resize(x, hw):
    # antialias=False: torch F.upsample(bilinear, align_corners=False)
    # does not prefilter on downscale (DSSINet.py:359-361) — jax.image
    # defaults to antialiasing, which diverges on the 0.5x pyramid leg
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, hw[0], hw[1], c), method="linear",
                            antialias=False)


@MODELS.register("dssinet")
class DSSINet(nn.Module):
    pretrained: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        d = self.dtype
        # shared VGG16 cfg 'F' stages (DSSINet.py:223): 64,64 | 128,128 |
        # 256,256,256 | 512,512,512 with pools between
        self.stage1 = _Stage((64, 64), pool=False, dtype=d)
        self.stage2 = _Stage((128, 128), dtype=d)
        self.stage3 = _Stage((256, 256, 256), dtype=d)
        self.stage4 = _Stage((512, 512, 512), dtype=d)
        # reference 'relu3'/'relu22' PReLUs: applied only where the
        # reference's sub_forward slices include them (DSSINet.py:345-399
        # — scale1's 0->7 chain crosses relu3; scale3's conv4_3 slice
        # ends at relu22)
        self.stage1_act = PReLU()
        self.stage4_act = PReLU()

        self.passing1 = MessagePassing(2, dtype=d)
        self.passing2 = MessagePassing(3, dtype=d)
        self.passing3 = MessagePassing(3, dtype=d)
        self.passing4 = MessagePassing(2, dtype=d)

        self.decoder1 = _Decoder(dtype=d)
        self.decoder2 = _Decoder(dtype=d)
        self.decoder3 = _Decoder(dtype=d)
        self.decoder4 = _Decoder(dtype=d)
        self.decoder5 = _Decoder(dtype=d)
        self.pw1 = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=d)
        self.pw2 = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=d)
        self.pw3 = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=d)
        self.pw4 = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=d)
        # ONE shared output PReLU like the reference's self.prelu
        # (DSSINet.py:341,408-411)
        self.out_prelu = PReLU()

    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        s1 = _resize(x, (h * 2, w * 2))  # pyramid x2 (DSSINet.py:290,360)
        s2 = x
        s3 = _resize(x, (h // 2, w // 2))  # x0.5

        # staged shared-front-end with cross-scale passing (DSSINet.py:365-397)
        # scale1's chain crosses the reference's relu3 (sub_forward
        # '0'->'7' includes it); the passing inputs stay pre-activation
        f1_c2 = self.stage2(self.stage1_act(self.stage1(s1)))
        f2_c1 = self.stage1(s2)
        f1_c2, f2_c1 = self.passing1([f1_c2, f2_c1])
        agg4 = jnp.concatenate([f1_c2, f2_c1], axis=-1)

        f1_c3 = self.stage3(f1_c2)
        f2_c2 = self.stage2(f2_c1)
        f3_c1 = self.stage1(s3)
        f1_c3, f2_c2, f3_c1 = self.passing2([f1_c3, f2_c2, f3_c1])
        agg3 = jnp.concatenate([f1_c3, f2_c2, f3_c1], axis=-1)

        f1_c4 = self.stage4(f1_c3)
        f2_c3 = self.stage3(f2_c2)
        f3_c2 = self.stage2(f3_c1)
        f1_c4, f2_c3, f3_c2 = self.passing3([f1_c4, f2_c3, f3_c2])
        agg2 = jnp.concatenate([f1_c4, f2_c3, f3_c2], axis=-1)

        f2_c4 = self.stage4(f2_c3)
        f3_c3 = self.stage3(f3_c2)
        f2_c4, f3_c3 = self.passing4([f2_c4, f3_c3])
        agg1 = jnp.concatenate([f2_c4, f3_c3], axis=-1)

        f3_c4 = self.stage4_act(self.stage4(f3_c3))

        dens1 = self.out_prelu(self.decoder1(f3_c4))
        dens2 = self.out_prelu(self.decoder2(agg1) + self.pw1(upsample(dens1, 2)))
        dens3 = self.out_prelu(self.decoder3(agg2) + self.pw2(upsample(dens2, 2)))
        dens4 = self.out_prelu(self.decoder4(agg3) + self.pw3(upsample(dens3, 2)))
        dens5 = nn.relu(self.decoder5(agg4) + self.pw4(upsample(dens4, 2)))
        return dens5
