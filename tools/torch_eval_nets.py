"""Torch-side TRUTH nets for validating the FID/FVD metric-net converters.

Two sources of truth, both runnable in-sandbox with cpu torch:

* I3D — the reference ships its own torch implementation
  (/root/reference/avgen/evaluations/models/pytorch_i3d.py:74-338,
  `InceptionI3d`).  That file imports torchvision at module level (line 349,
  for the unrelated `InceptionI3d_Classifier`), which is not installed here,
  so `load_reference_i3d_module()` execs the source truncated just before
  that import.  Tracing the instantiated net with `torch.jit.trace` mints a
  REAL torchscript blob whose `state_dict()` carries the real
  pytorch-i3d key names (`Mixed_3b.b0.conv3d.weight`,
  `Conv3d_1a_7x7.bn.running_mean`, `logits.conv3d.bias`, ...), resolving
  the key-scheme candidates in convert/torch_to_jax.py:i3d_key_map.

* FID InceptionV3 — the reference net (avgen/evaluations/models/
  inception_v3.py:184-208 `fid_inception_v3`) is torchvision's
  `inception_v3(num_classes=1008, aux_logits=False)` with the Mixed_5*/6*/7*
  blocks swapped for FID-patched forwards (:211-328).  torchvision itself is
  not installed, so `FIDInceptionV3Torch` replicates that graph in plain
  torch with the EXACT module tree of torchvision's Inception3 — the state
  dict key space is therefore identical to the published
  pt_inception-2015-12-05-6726825d.pth blob (`Conv2d_1a_3x3.conv.weight`,
  `Mixed_5b.branch1x1.bn.running_var`, `fc.weight`, ...).  The forward is
  the reference wrapper's blocks 0-3 path (inception_v3.py:70-116,138-148):
  stem -> maxpool -> stem2 -> maxpool -> Mixed_5b..6e -> Mixed_7a..7c ->
  adaptive avg pool -> 2048-d pool3 features.
"""
from __future__ import annotations

import os

import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_I3D = "/root/reference/avgen/evaluations/models/pytorch_i3d.py"


# ---------------------------------------------------------------------------
# I3D: exec the reference's own source (truncated before its torchvision
# import) so the torch net under test IS the reference implementation.
# ---------------------------------------------------------------------------

def load_reference_i3d_module(path: str = REFERENCE_I3D):
    """Exec pytorch_i3d.py up to (not including) its torchvision import."""
    with open(path) as f:
        src = f.read()
    cut = src.find("from torchvision")
    if cut > 0:
        src = src[:cut]
    ns = {"__name__": "reference_pytorch_i3d", "__file__": path}
    exec(compile(src, path, "exec"), ns)  # noqa: S102 - reading ref source
    return ns


def make_reference_i3d(num_classes: int = 400, seed: int = 0):
    """Instantiate the reference InceptionI3d with randomized params/stats."""
    ns = load_reference_i3d_module()
    torch.manual_seed(seed)
    net = ns["InceptionI3d"](num_classes=num_classes, in_channels=3)
    net.eval()
    _randomize_bn_stats(net, seed)
    return net


def _randomize_bn_stats(net: nn.Module, seed: int) -> None:
    """Give BN layers non-trivial running stats so conversion bugs show."""
    g = torch.Generator().manual_seed(seed + 1)
    for m in net.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.copy_(
                    0.3 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(
                    (0.5 + torch.rand(m.running_var.shape, generator=g)))
                m.weight.copy_(
                    1.0 + 0.2 * torch.randn(m.weight.shape, generator=g))
                m.bias.copy_(
                    0.1 * torch.randn(m.bias.shape, generator=g))


# ---------------------------------------------------------------------------
# FID InceptionV3 (torchvision Inception3 module tree + FID-patched forwards)
# ---------------------------------------------------------------------------

class BasicConv2d(nn.Module):
    def __init__(self, in_ch, out_ch, **kwargs):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, bias=False, **kwargs)
        self.bn = nn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


def _avg_pool_fid(x):
    # reference inception_v3.py:228-229 - TF semantics, no padded zeros
    return F.avg_pool2d(x, kernel_size=3, stride=1, padding=1,
                        count_include_pad=False)


class FIDInceptionA(nn.Module):
    def __init__(self, in_channels, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_channels, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(in_channels, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(in_channels, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(in_channels, pool_features,
                                       kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avg_pool_fid(x))
        return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, in_channels):
        super().__init__()
        self.branch3x3 = BasicConv2d(in_channels, 384, kernel_size=3,
                                     stride=2)
        self.branch3x3dbl_1 = BasicConv2d(in_channels, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class FIDInceptionC(nn.Module):
    def __init__(self, in_channels, channels_7x7):
        super().__init__()
        c7 = channels_7x7
        self.branch1x1 = BasicConv2d(in_channels, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(in_channels, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(in_channels, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(in_channels, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(_avg_pool_fid(x))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, in_channels):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(in_channels, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(in_channels, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class FIDInceptionE(nn.Module):
    def __init__(self, in_channels, use_max_pool: bool):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_channels, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(in_channels, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(in_channels, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(in_channels, 192, kernel_size=1)
        self._use_max_pool = use_max_pool

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)],
                       1)
        if self._use_max_pool:  # FIDInceptionE_2 (inception_v3.py:324)
            bp = F.max_pool2d(x, kernel_size=3, stride=1, padding=1)
        else:                   # FIDInceptionE_1 (inception_v3.py:289)
            bp = _avg_pool_fid(x)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class FIDInceptionV3Torch(nn.Module):
    """fid_inception_v3() graph; forward = reference blocks 0-3 (pool3)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = FIDInceptionA(192, pool_features=32)
        self.Mixed_5c = FIDInceptionA(256, pool_features=64)
        self.Mixed_5d = FIDInceptionA(288, pool_features=64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = FIDInceptionC(768, channels_7x7=128)
        self.Mixed_6c = FIDInceptionC(768, channels_7x7=160)
        self.Mixed_6d = FIDInceptionC(768, channels_7x7=160)
        self.Mixed_6e = FIDInceptionC(768, channels_7x7=192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = FIDInceptionE(1280, use_max_pool=False)
        self.Mixed_7c = FIDInceptionE(2048, use_max_pool=True)
        self.fc = nn.Linear(2048, 1008)  # in the published blob; unused here

    def forward(self, x):
        """(b, 3, 229, 229) in [-1, 1] -> (b, 2048) pool3 features."""
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        x = F.adaptive_avg_pool2d(x, (1, 1))
        return torch.flatten(x, 1)


def make_fid_inception(seed: int = 0) -> FIDInceptionV3Torch:
    torch.manual_seed(seed)
    net = FIDInceptionV3Torch()
    net.eval()
    _randomize_bn_stats(net, seed)
    return net


# ---------------------------------------------------------------------------
# artifact minting
# ---------------------------------------------------------------------------

def mint_artifacts(out_dir: str, seed: int = 0,
                   trace_shape=(1, 3, 12, 224, 224)) -> dict:
    """Write fabricated-but-real-format metric-net artifacts into out_dir.

    Produces the exact files scripts/animation_eval.py looks for:
      pt_inception-2015-12-05-6726825d.pth  (FID state dict, published keys)
      i3d_torchscript.pt                    (traced reference InceptionI3d)
    Returns {"fid": path, "i3d": path}.
    """
    os.makedirs(out_dir, exist_ok=True)
    fid_path = os.path.join(out_dir, "pt_inception-2015-12-05-6726825d.pth")
    torch.save(make_fid_inception(seed).state_dict(), fid_path)

    i3d = make_reference_i3d(seed=seed)
    with torch.no_grad():
        traced = torch.jit.trace(i3d, torch.randn(*trace_shape))
    i3d_path = os.path.join(out_dir, "i3d_torchscript.pt")
    torch.jit.save(traced, i3d_path)
    return {"fid": fid_path, "i3d": i3d_path}


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    print(mint_artifacts(a.out_dir, a.seed))
