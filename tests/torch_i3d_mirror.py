"""Faithful torch InceptionI3d (piergiaj/pytorch-i3d structure) used ONLY
as the golden-test oracle for the JAX port + converter: random weights are
converted with tools/convert_i3d.py's structural matcher and outputs must
agree. Mirrors the architecture the reference's torchscript wraps
(``/root/reference/model/metrics/fvd.py:27-37``)."""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from titok_tpu.metrics.i3d import MIXED_CHANNELS


def _same_pad(size, kernel, stride):
    out = math.ceil(size / stride)
    return max((out - 1) * stride + kernel - size, 0)


def _pad_same_3d(x, kernel, stride):
    # TF-SAME: front gets pad//2 (pytorch-i3d MaxPool3dSamePadding/Unit3D)
    pads = []
    for d in (4, 3, 2):  # W, H, T (F.pad wants last-dim-first pairs)
        size = x.shape[d]
        k = kernel[d - 2]
        s = stride[d - 2]
        p = _same_pad(size, k, s)
        pads += [p // 2, p - p // 2]
    return F.pad(x, pads)


class Unit3D(nn.Module):
    def __init__(self, in_ch, out_ch, kernel=(1, 1, 1), stride=(1, 1, 1),
                 relu=True, bn=True, bias=False):
        super().__init__()
        self.kernel, self.stride, self.relu = kernel, stride, relu
        self.conv3d = nn.Conv3d(in_ch, out_ch, kernel, stride, padding=0,
                                bias=bias)
        self.bn = nn.BatchNorm3d(out_ch, eps=1e-3, momentum=0.01) if bn else None

    def forward(self, x):
        x = self.conv3d(_pad_same_3d(x, self.kernel, self.stride))
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.relu else x


class MaxPoolSame(nn.Module):
    def __init__(self, kernel, stride):
        super().__init__()
        self.kernel, self.stride = kernel, stride

    def forward(self, x):
        x = _pad_same_3d(x, self.kernel, self.stride)
        return F.max_pool3d(x, self.kernel, self.stride)


class InceptionModule(nn.Module):
    def __init__(self, in_ch, ch):
        super().__init__()
        b0, (b1a, b1b), (b2a, b2b), b3 = ch
        self.b0 = Unit3D(in_ch, b0)
        self.b1a = Unit3D(in_ch, b1a)
        self.b1b = Unit3D(b1a, b1b, kernel=(3, 3, 3))
        self.b2a = Unit3D(in_ch, b2a)
        self.b2b = Unit3D(b2a, b2b, kernel=(3, 3, 3))
        self.b3a = MaxPoolSame((3, 3, 3), (1, 1, 1))
        self.b3b = Unit3D(in_ch, b3)

    def forward(self, x):
        return torch.cat([
            self.b0(x),
            self.b1b(self.b1a(x)),
            self.b2b(self.b2a(x)),
            self.b3b(self.b3a(x)),
        ], dim=1)

    @property
    def out_channels(self):
        pass


def _out_ch(ch):
    b0, (_, b1b), (_, b2b), b3 = ch
    return b0 + b1b + b2b + b3


class TorchInceptionI3d(nn.Module):
    def __init__(self, num_classes=400):
        super().__init__()
        self.Conv3d_1a_7x7 = Unit3D(3, 64, kernel=(7, 7, 7), stride=(2, 2, 2))
        self.pool_2a = MaxPoolSame((1, 3, 3), (1, 2, 2))
        self.Conv3d_2b_1x1 = Unit3D(64, 64)
        self.Conv3d_2c_3x3 = Unit3D(64, 192, kernel=(3, 3, 3))
        self.pool_3a = MaxPoolSame((1, 3, 3), (1, 2, 2))
        in_ch = 192
        for name in ("Mixed_3b", "Mixed_3c"):
            setattr(self, name, InceptionModule(in_ch, MIXED_CHANNELS[name]))
            in_ch = _out_ch(MIXED_CHANNELS[name])
        self.pool_4a = MaxPoolSame((3, 3, 3), (2, 2, 2))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                     "Mixed_4f"):
            setattr(self, name, InceptionModule(in_ch, MIXED_CHANNELS[name]))
            in_ch = _out_ch(MIXED_CHANNELS[name])
        self.pool_5a = MaxPoolSame((2, 2, 2), (2, 2, 2))
        for name in ("Mixed_5b", "Mixed_5c"):
            setattr(self, name, InceptionModule(in_ch, MIXED_CHANNELS[name]))
            in_ch = _out_ch(MIXED_CHANNELS[name])
        self.logits = Unit3D(in_ch, num_classes, relu=False, bn=False,
                             bias=True)

    def forward(self, x):  # NCTHW in [-1, 1]
        x = self.Conv3d_1a_7x7(x)
        x = self.pool_2a(x)
        x = self.Conv3d_2b_1x1(x)
        x = self.Conv3d_2c_3x3(x)
        x = self.pool_3a(x)
        x = self.Mixed_3b(x)
        x = self.Mixed_3c(x)
        x = self.pool_4a(x)
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                     "Mixed_4f"):
            x = getattr(self, name)(x)
        x = self.pool_5a(x)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        # head: AvgPool3d((2,7,7), stride 1) VALID -> logits -> time mean
        # (min() so small golden-test inputs stay valid; the real 224² path
        # always sees the full (2,7,7) kernel)
        k = (min(2, x.shape[2]), min(7, x.shape[3]), min(7, x.shape[4]))
        x = F.avg_pool3d(x, k, stride=(1, 1, 1))
        x = self.logits(x)
        return x.mean(dim=(2, 3, 4))
