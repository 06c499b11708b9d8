"""Loss zoo parity tests.

Golden values are computed with torch (CPU) directly from the formulas
the reference uses, so the JAX implementations are validated against an
independent implementation, not against themselves.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from dgvcc_tpu.losses import (
    BayesianLoss,
    MSECountLoss,
    jsd_loss,
    lw_loss,
    ortho_loss,
    sim_loss,
    triplet_loss,
)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_mse_count_loss(rng):
    pred = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    gt = rng.uniform(0, 0.01, size=(2, 16, 16, 1)).astype(np.float32)
    ours = float(MSECountLoss()(pred, gt, log_para=1000.0))
    golden = float(TF.mse_loss(torch.tensor(pred), torch.tensor(gt) * 1000.0))
    assert ours == pytest.approx(golden, rel=1e-5)


def test_ortho_loss(rng):
    x = rng.normal(size=(8, 32)).astype(np.float32)
    y = rng.normal(size=(8, 32)).astype(np.float32)
    ours = float(ortho_loss(x, y))
    tx, ty = torch.tensor(x), torch.tensor(y)
    golden = float(torch.mean(torch.square(torch.triu(tx @ ty.t(), diagonal=1))))
    assert ours == pytest.approx(golden, rel=1e-5)


def test_sim_loss(rng):
    x = rng.normal(size=(2, 6, 4, 4)).astype(np.float32)
    y = rng.normal(size=(2, 6, 4, 4)).astype(np.float32)
    ours = float(sim_loss(x, y))
    tx = torch.tensor(x).view(2, 6, -1)
    ty = torch.tensor(y).view(2, 6, -1)
    recon = torch.bmm(ty.transpose(1, 2), tx)
    tgt = torch.arange(16).unsqueeze(0).repeat(2, 1)
    golden = float(TF.cross_entropy(recon, tgt))
    assert ours == pytest.approx(golden, rel=1e-5)


def test_lw_loss(rng):
    x = rng.normal(size=(2, 6, 4, 4)).astype(np.float32)
    ours = float(lw_loss(x))
    tx = torch.tensor(x).view(2, 6, -1)
    tx = tx - tx.mean(dim=2, keepdim=True)
    tx = tx / torch.sqrt(tx.var(dim=2, keepdim=True) + 1e-5)
    gram = tx @ tx.transpose(1, 2)
    golden = float(torch.sum(torch.square(torch.triu(gram, diagonal=1))))
    assert ours == pytest.approx(golden, rel=1e-4)


def test_triplet_loss(rng):
    a = rng.normal(size=(4, 8)).astype(np.float32)
    p = rng.normal(size=(4, 8)).astype(np.float32)
    n = rng.normal(size=(4, 8)).astype(np.float32)
    ours = float(triplet_loss(a, p, n, margin=0.5))
    ta, tp, tn = map(torch.tensor, (a, p, n))
    d_p = torch.sum((ta - tp) ** 2, dim=1)
    d_n = torch.sum((ta - tn) ** 2, dim=1)
    golden = float(torch.clamp(0.5 + d_p - d_n, min=0.0).mean())
    assert ours == pytest.approx(golden, rel=1e-5)


def test_jsd_loss(rng):
    l1 = rng.normal(size=(2, 64, 16)).astype(np.float32)
    l2 = rng.normal(size=(2, 64, 16)).astype(np.float32)
    ours = float(jsd_loss(l1, l2))
    p1 = torch.softmax(torch.tensor(l1), dim=-1)
    p2 = torch.softmax(torch.tensor(l2), dim=-1)
    golden = float(TF.mse_loss(p1, p2))
    assert ours == pytest.approx(golden, rel=1e-5)


# --------------------------------------------------------------------------
# Bayesian loss golden: the torch reference algorithm, ragged
# --------------------------------------------------------------------------

def bl_golden_torch(points_list, st_sizes, targets_list, density, sigma, c_size,
                    stride, bg_ratio, use_bg):
    cood = torch.arange(0, c_size, step=stride, dtype=torch.float32) + stride / 2
    cood = cood.unsqueeze(0)
    num_per = [len(p) for p in points_list]
    all_points = torch.cat([torch.tensor(p, dtype=torch.float32) for p in points_list])
    if len(all_points) > 0:
        x = all_points[:, 0].unsqueeze(1)
        y = all_points[:, 1].unsqueeze(1)
        x_dis = -2 * x @ cood + x * x + cood * cood
        y_dis = -2 * y @ cood + y * y + cood * cood
        dis = y_dis.unsqueeze(2) + x_dis.unsqueeze(1)
        dis = dis.view(dis.size(0), -1)
        dis_list = torch.split(dis, num_per)
        prob_list = []
        for d, st in zip(dis_list, st_sizes):
            if len(d) > 0:
                if use_bg:
                    min_dis = torch.clamp(torch.min(d, dim=0, keepdim=True)[0], min=0.0)
                    bg_dis = (st * bg_ratio - torch.sqrt(min_dis)) ** 2
                    d = torch.cat([d, bg_dis], 0)
                prob = torch.softmax(-d / (2.0 * sigma**2), dim=0)
            else:
                prob = None
            prob_list.append(prob)
    else:
        prob_list = [None] * len(points_list)

    loss = 0.0
    for idx, prob in enumerate(prob_list):
        if prob is None or prob.shape[0] == 0:
            pre_count = torch.sum(density[idx])
            target = torch.zeros(1)
        else:
            n = len(prob)
            if use_bg:
                target = torch.zeros(n)
                target[:-1] = torch.tensor(targets_list[idx], dtype=torch.float32)
            else:
                target = torch.tensor(targets_list[idx], dtype=torch.float32)
            pre_count = torch.sum(density[idx].view(1, -1) * prob, dim=1)
        res = torch.abs(target - pre_count)
        num = math.ceil(0.9 * (len(res) - 1))
        loss += torch.sum(torch.topk(res[:-1], num, largest=False)[0])
        loss += res[-1]
    return float(loss / len(prob_list))


def _pad(points_list, targets_list, n_max):
    b = len(points_list)
    pts = np.zeros((b, n_max, 2), np.float32)
    msk = np.zeros((b, n_max), bool)
    tgt = np.zeros((b, n_max), np.float32)
    for i, (p, t) in enumerate(zip(points_list, targets_list)):
        k = len(p)
        if k:
            pts[i, :k] = p
            msk[i, :k] = True
            tgt[i, :k] = t
    return pts, msk, tgt


@pytest.mark.parametrize("use_bg", [True, False])
def test_bayesian_loss_parity(rng, use_bg):
    c_size, stride, sigma, bg_ratio = 32, 8, 8.0, 0.15
    density = rng.uniform(0, 1, size=(3, 4, 4, 1)).astype(np.float32)
    points_list = [
        rng.uniform(0, 32, size=(5, 2)).astype(np.float32),
        rng.uniform(0, 32, size=(2, 2)).astype(np.float32),
        rng.uniform(0, 32, size=(9, 2)).astype(np.float32),
    ]
    targets_list = [rng.uniform(0.3, 1.0, size=len(p)).astype(np.float32) for p in points_list]
    st_sizes = np.array([320.0, 256.0, 512.0], np.float32)

    golden = bl_golden_torch(
        points_list, st_sizes, targets_list,
        torch.tensor(density).permute(0, 3, 1, 2),
        sigma, c_size, stride, bg_ratio, use_bg,
    )
    pts, msk, tgt = _pad(points_list, targets_list, 12)
    loss = BayesianLoss(sigma, c_size, stride, bg_ratio, use_bg)
    ours = float(loss(pts, msk, tgt, st_sizes, density))
    assert ours == pytest.approx(golden, rel=1e-4)


def test_bayesian_loss_empty_image(rng):
    density = rng.uniform(0, 1, size=(1, 4, 4, 1)).astype(np.float32)
    golden = bl_golden_torch(
        [np.zeros((0, 2), np.float32)], np.array([320.0]), [np.zeros(0, np.float32)],
        torch.tensor(density).permute(0, 3, 1, 2), 8.0, 32, 8, 0.15, True,
    )
    pts, msk, tgt = _pad([np.zeros((0, 2), np.float32)], [np.zeros(0, np.float32)], 4)
    loss = BayesianLoss(8.0, 32, 8, 0.15, True)
    ours = float(loss(pts, msk, tgt, np.array([320.0], np.float32), density))
    assert ours == pytest.approx(golden, rel=1e-5)
