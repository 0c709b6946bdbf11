"""FID Inception extractor: parity vs an independent torch mirror.

pytorch-fid/torchvision are not installed in this environment, so the test
carries its own torch implementation of the FID-Inception architecture
(BasicConv2d + the A/B/C/D/E blocks with the three FID deviations),
random-initialized with non-trivial BatchNorm running stats — an
independent implementation path that catches layout transposes, BN
folding, padding conventions, the count_include_pad=False average pool,
and branch concat order.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from qdiffusion_tpu.metrics.inception import (
    convert_pt_inception,
    extract_features,
    inception_pool3,
    preprocess,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class Basic(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class IncA(nn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.branch1x1 = Basic(cin, 64, kernel_size=1)
        self.branch5x5_1 = Basic(cin, 48, kernel_size=1)
        self.branch5x5_2 = Basic(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = Basic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = Basic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = Basic(96, 96, kernel_size=3, padding=1)
        self.branch_pool = Basic(cin, pool, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x))], 1)


class IncB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = Basic(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = Basic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = Basic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = Basic(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2)], 1)


class IncC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = Basic(cin, 192, kernel_size=1)
        self.branch7x7_1 = Basic(cin, c7, kernel_size=1)
        self.branch7x7_2 = Basic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = Basic(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = Basic(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = Basic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = Basic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = Basic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = Basic(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = Basic(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg(x))], 1)


class IncD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = Basic(cin, 192, kernel_size=1)
        self.branch3x3_2 = Basic(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = Basic(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = Basic(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = Basic(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = Basic(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2)], 1)


class IncE(nn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = Basic(cin, 320, kernel_size=1)
        self.branch3x3_1 = Basic(cin, 384, kernel_size=1)
        self.branch3x3_2a = Basic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = Basic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = Basic(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = Basic(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = Basic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = Basic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = Basic(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = _avg(x) if self.pool == "avg" else F.max_pool2d(
            x, 3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TorchFIDInception(nn.Module):
    """Mirror of pytorch_fid's InceptionV3 feature path (pool3)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = Basic(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = Basic(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = Basic(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = Basic(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = Basic(80, 192, kernel_size=3)
        self.Mixed_5b = IncA(192, 32)
        self.Mixed_5c = IncA(256, 64)
        self.Mixed_5d = IncA(288, 64)
        self.Mixed_6a = IncB(288)
        self.Mixed_6b = IncC(768, 128)
        self.Mixed_6c = IncC(768, 160)
        self.Mixed_6d = IncC(768, 160)
        self.Mixed_6e = IncC(768, 192)
        self.Mixed_7a = IncD(768)
        self.Mixed_7b = IncE(1280, "avg")
        self.Mixed_7c = IncE(2048, "max")

    def forward(self, x):
        h = self.Conv2d_1a_3x3(x)
        h = self.Conv2d_2a_3x3(h)
        h = self.Conv2d_2b_3x3(h)
        h = F.max_pool2d(h, 3, stride=2)
        h = self.Conv2d_3b_1x1(h)
        h = self.Conv2d_4a_3x3(h)
        h = F.max_pool2d(h, 3, stride=2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                  self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            h = m(h)
        return F.adaptive_avg_pool2d(h, 1).flatten(1)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    m = TorchFIDInception().eval()
    # non-trivial BN running stats so folding is actually exercised, and
    # amplified conv weights so the 17-layer stack stays input-sensitive
    # (at default kaiming scale the folded biases dominate and features
    # collapse to an input-independent constant)
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(
                    0.3 * torch.randn(mod.running_mean.shape, generator=g))
                mod.running_var.copy_(
                    (0.5 + torch.rand(mod.running_var.shape, generator=g)))
            elif isinstance(mod, nn.Conv2d):
                mod.weight.mul_(3.0)
    params = convert_pt_inception(m.state_dict())
    return m, params


def test_pool3_parity(models):
    m, params = models
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ours = np.asarray(inception_pool3(params, jnp.asarray(x)))
    assert ours.shape == (2, 2048)
    # features are O(1000) with the amplified fixture; atol covers relu
    # boundary flips from 1e-7-level conv noise
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-2)


def test_preprocess_matches_torch_interpolate(models):
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, size=(2, 64, 64, 3), dtype=np.uint8)
    ours = np.asarray(preprocess(jnp.asarray(imgs)))
    ref = F.interpolate(
        torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2))).float() / 255.0,
        size=(299, 299), mode="bilinear", align_corners=False).numpy()
    ref = 2.0 * ref - 1.0
    np.testing.assert_allclose(
        ours, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4)


def test_extract_features_batched_and_fid(models, tmp_path):
    """End-to-end: images -> pool3 features -> FID between two sets."""
    from qdiffusion_tpu.metrics.fid import compute_statistics, frechet_distance

    _, params = models
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, size=(5, 32, 32, 3), dtype=np.uint8)
    b = (a.astype(np.int32) + rng.integers(-40, 40, a.shape)).clip(
        0, 255).astype(np.uint8)
    fa = extract_features(params, a, batch_size=4)  # exercises padding
    fb = extract_features(params, b, batch_size=4)
    assert fa.shape == (5, 2048)
    fid_ab = frechet_distance(*compute_statistics(fa),
                              *compute_statistics(fb))
    fid_aa = frechet_distance(*compute_statistics(fa),
                              *compute_statistics(fa))
    # identical sets score ~0 (sqrtm numerics allow a tiny negative at
    # N << D); distinct sets must score decisively higher
    assert abs(fid_aa) < 1.0
    assert np.isfinite(fid_ab) and fid_ab > 100.0 * (abs(fid_aa) + 1e-9)


def test_cli_fid(models, tmp_path, capsys):
    """fid subcommand: PNG dir + npz dump -> one JSON line."""
    import json
    from PIL import Image

    from qdiffusion_tpu import cli

    m, _ = models
    ckpt = tmp_path / "pt_inception.pth"
    torch.save(m.state_dict(), ckpt)

    rng = np.random.default_rng(3)
    d1 = tmp_path / "a"
    d1.mkdir()
    imgs = rng.integers(0, 256, size=(3, 16, 16, 3), dtype=np.uint8)
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(d1 / f"{i:06d}.png")
    npz = tmp_path / "b.npz"
    np.savez(npz, (imgs.astype(np.int32) + 30).clip(0, 255).astype(np.uint8))

    cli.main(["fid", "--set1", str(d1), "--set2", str(npz),
              "--inception", str(ckpt), "--batch", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["fid"]) and out["n1"] == 3 and out["n2"] == 3
