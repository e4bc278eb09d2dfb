"""Golden full-network numerics vs an independently-built torch PVNet.

A torch twin of the reference architecture (lib/networks/pvnet/resnet18.py:
9-108 + resnet.py:166-220) is constructed here from the same written spec —
NOT from reference code — with reference-layout parameter names
(resnet18_8s.*, conv8s.*, convraw.*). Weights initialized in flax are
exported with export_pvnet_state_dict, loaded into the twin with
strict name checking, and the two frameworks' full forwards and training
losses are compared on identical inputs. This pins the WHOLE network +
loss numerics across frameworks, not just per-layer conversion
(tests/test_torch_import.py covers that direction).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class _Block(nn.Module):
    def __init__(self, cin, cout, stride=1, dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        res = x if self.downsample is None else self.downsample(x)
        return F.relu(y + res)


class _Trunk(nn.Module):
    """Dilated stride-8 ResNet-18 trunk (ref resnet.py:166-220): stages at
    (64,s1,d1) (128,s2,d1) (256,s1,d2) (512,s1,d4), fc as conv3x3+bn+relu."""

    def __init__(self, fc_dim=256):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        plan = [(64, 64, 1, 1), (64, 128, 2, 1), (128, 256, 1, 2),
                (256, 512, 1, 4)]
        for i, (cin, cout, s, d) in enumerate(plan, start=1):
            setattr(self, f"layer{i}", nn.Sequential(
                _Block(cin, cout, s, d), _Block(cout, cout, 1, d)
            ))
        self.fc = nn.Sequential(
            nn.Conv2d(512, fc_dim, 3, padding=1, bias=False),
            nn.BatchNorm2d(fc_dim),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        x2s = F.relu(self.bn1(self.conv1(x)))
        y = self.maxpool(x2s)
        x4s = self.layer1(y)
        x8s = self.layer2(x4s)
        x16s = self.layer3(x8s)
        x32s = self.layer4(x16s)
        xfc = self.fc(x32s)
        return x2s, x4s, x8s, x16s, x32s, xfc


class TorchPVNet(nn.Module):
    """Skip-fusion decoder head over the trunk (ref resnet18.py:24-59,78-96),
    with each upsample targeting the skip tensor's exact spatial size."""

    def __init__(self, ver_dim=18, seg_dim=2):
        super().__init__()
        self.resnet18_8s = _Trunk()

        def stage(cin, cout):
            return nn.Sequential(
                nn.Conv2d(cin, cout, 3, padding=1, bias=False),
                nn.BatchNorm2d(cout),
                nn.LeakyReLU(0.1, inplace=True),
            )

        self.conv8s = stage(256 + 128, 128)
        self.conv4s = stage(128 + 64, 64)
        self.conv2s = stage(64 + 64, 32)
        self.convraw = nn.Sequential(
            nn.Conv2d(32 + 3, 32, 3, padding=1, bias=False),
            nn.BatchNorm2d(32),
            nn.LeakyReLU(0.1, inplace=True),
            nn.Conv2d(32, seg_dim + ver_dim, 1),
        )
        self.seg_dim = seg_dim

    def forward(self, x):
        x2s, x4s, x8s, _, _, xfc = self.resnet18_8s(x)

        def up(t, ref):
            return F.interpolate(t, size=ref.shape[2:], mode="bilinear",
                                 align_corners=False)

        fm = self.conv8s(torch.cat([xfc, x8s], 1))
        fm = self.conv4s(torch.cat([up(fm, x4s), x4s], 1))
        fm = self.conv2s(torch.cat([up(fm, x2s), x2s], 1))
        out = self.convraw(torch.cat([up(fm, x), x], 1))
        return out[:, : self.seg_dim], out[:, self.seg_dim:]


def _build_pair(seed=0):
    from clean_pvnet_tpu.config import Config
    from clean_pvnet_tpu.models import make_network
    from clean_pvnet_tpu.models.torch_import import export_pvnet_state_dict

    cfg = Config().with_overrides({"network.use_bfloat16": False})
    model = make_network(cfg)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    # randomize batch stats so BN actually tests the stats wiring
    rng = np.random.RandomState(seed)
    variables = jax.tree.map(lambda a: a, variables)  # unfreeze-safe copy
    sd = export_pvnet_state_dict(variables)
    sd = {
        k: (v + rng.rand(*np.shape(v)).astype(np.float32) * 0.05
            if k.endswith("running_var") else v)
        for k, v in sd.items()
    }
    twin = TorchPVNet()
    missing, unexpected = twin.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all(m.endswith("num_batches_tracked") for m in missing), missing

    # bring the perturbed running_var back into flax for a fair comparison
    from clean_pvnet_tpu.models.torch_import import import_pvnet_state_dict

    variables = import_pvnet_state_dict(sd, variables)
    variables = jax.tree.map(jnp.asarray, variables)
    return model, variables, twin


@pytest.mark.parametrize("hw", [(128, 160), (121, 161)])
def test_full_forward_matches_torch(hw):
    model, variables, twin = _build_pair()
    h, w = hw
    rng = np.random.RandomState(1)
    x = rng.randn(2, h, w, 3).astype(np.float32)

    out = model.apply(variables, jnp.asarray(x), train=False)
    seg_j = np.asarray(out["seg"])
    ver_j = np.asarray(out["vertex"])

    twin.eval()
    with torch.no_grad():
        seg_t, ver_t = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    seg_t = seg_t.numpy().transpose(0, 2, 3, 1)
    ver_t = ver_t.numpy().transpose(0, 2, 3, 1)

    # 20 conv layers of fp32 accumulation divergence (XLA vs oneDNN): the
    # fields must agree to ~1e-3 absolute, tighter in the median
    assert np.abs(seg_j - seg_t).max() < 2e-3, np.abs(seg_j - seg_t).max()
    assert np.abs(ver_j - ver_t).max() < 2e-3, np.abs(ver_j - ver_t).max()
    assert np.median(np.abs(ver_j - ver_t)) < 1e-4


def test_loss_matches_torch_semantics():
    """Loss golden: pvnet_loss == the reference NetworkWrapper math
    (ref lib/train/trainers/pvnet.py:15-39) evaluated with torch ops."""
    from clean_pvnet_tpu.train.loss import pvnet_loss

    rng = np.random.RandomState(2)
    b, h, w, vn2 = 2, 24, 32, 18
    seg = rng.randn(b, h, w, 2).astype(np.float32) * 2
    ver = rng.randn(b, h, w, vn2).astype(np.float32)
    ver_gt = rng.randn(b, h, w, vn2).astype(np.float32)
    mask = (rng.rand(b, h, w) > 0.6).astype(np.int32)

    total, stats = pvnet_loss(
        jnp.asarray(seg), jnp.asarray(ver), jnp.asarray(mask),
        jnp.asarray(ver_gt)
    )

    wt = torch.from_numpy(mask.astype(np.float32))[:, None]  # [B,1,H,W]
    vp = torch.from_numpy(ver.transpose(0, 3, 1, 2))
    vg = torch.from_numpy(ver_gt.transpose(0, 3, 1, 2))
    vote_t = F.smooth_l1_loss(vp * wt, vg * wt, reduction="sum")
    vote_t = vote_t / (wt.sum() + 1e-6) / vn2
    seg_t = F.cross_entropy(
        torch.from_numpy(seg.transpose(0, 3, 1, 2)),
        torch.from_numpy(mask.astype(np.int64)),
    )
    np.testing.assert_allclose(float(stats["vote_loss"]), float(vote_t),
                               rtol=1e-5)
    np.testing.assert_allclose(float(stats["seg_loss"]), float(seg_t),
                               rtol=1e-5)
    np.testing.assert_allclose(float(total), float(vote_t + seg_t), rtol=1e-5)
