"""Reference AVModel rebuilt in plain torch for end-to-end parity tests.

The reference (/root/reference/model.py:93-121,169-253) composes
torchvision's ``r2plus1d_18`` video tower and a 1-channel-stem torchvision
ResNet audio tower with per-head MLPv2 classifiers. torchvision is not
installed in this image, so this module re-implements those torchvision
architectures from their public spec with IDENTICAL state-dict naming —
``load_state_dict(strict=True)`` on an exported checkpoint is therefore a
full schema check, and a forward pass is the ground-truth reference
computation.

Key structural facts mirrored from torchvision:
* video BasicBlock computes ONE ``midplanes`` from (inplanes, planes) and
  shares it across both factorized convs;
* block BNs live inside the conv Sequentials (``conv1.1`` / ``conv2.1``);
* the R2Plus1dStem is Conv(1,7,7)/BN/ReLU/Conv(3,1,1)/BN/ReLU;
* downsample is a 1x1x1 Conv3d with isotropic stride + BN;
* audio ResNet BasicBlock uses attribute names conv1/bn1/conv2/bn2 and a
  7x7 stride-2 one-channel stem conv (reference model.py:103-121).
"""

from __future__ import annotations

import torch
from torch import nn


def _video_midplanes(cin: int, cout: int) -> int:
    return (cin * cout * 3 * 3 * 3) // (cin * 3 * 3 + 3 * cout)


class Conv2Plus1D(nn.Sequential):
    def __init__(self, cin, cout, mid, stride=1):
        super().__init__(
            nn.Conv3d(cin, mid, (1, 3, 3), stride=(1, stride, stride),
                      padding=(0, 1, 1), bias=False),
            nn.BatchNorm3d(mid),
            nn.ReLU(inplace=True),
            nn.Conv3d(mid, cout, (3, 1, 1), stride=(stride, 1, 1),
                      padding=(1, 0, 0), bias=False),
        )


class VideoBasicBlock(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        mid = _video_midplanes(cin, planes)  # shared by BOTH convs
        self.conv1 = nn.Sequential(
            Conv2Plus1D(cin, planes, mid, stride),
            nn.BatchNorm3d(planes),
            nn.ReLU(inplace=True),
        )
        self.conv2 = nn.Sequential(
            Conv2Plus1D(planes, planes, mid),
            nn.BatchNorm3d(planes),
        )
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, planes, kernel_size=1,
                          stride=(stride, stride, stride), bias=False),
                nn.BatchNorm3d(planes),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.conv2(self.conv1(x))
        return self.relu(out + identity)


class VideoResNetR2Plus1D18(nn.Module):
    """torchvision ``r2plus1d_18`` with ``fc = Identity`` (the reference
    replaces fc, model.py:93-100)."""

    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv3d(3, 45, (1, 7, 7), stride=(1, 2, 2),
                      padding=(0, 3, 3), bias=False),
            nn.BatchNorm3d(45),
            nn.ReLU(inplace=True),
            nn.Conv3d(45, 64, (3, 1, 1), stride=1, padding=(1, 0, 0),
                      bias=False),
            nn.BatchNorm3d(64),
            nn.ReLU(inplace=True),
        )
        cin = 64
        for i, (planes, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)], start=1
        ):
            setattr(self, f"layer{i}", nn.Sequential(
                VideoBasicBlock(cin, planes, stride),
                VideoBasicBlock(planes, planes, 1),
            ))
            cin = planes
        self.avgpool = nn.AdaptiveAvgPool3d((1, 1, 1))

    def forward(self, x):  # [B, 3, T, H, W]
        x = self.stem(x)
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return self.avgpool(x).flatten(1)  # [B, 512]


class AudioBasicBlock(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.bn2(self.conv2(self.relu(self.bn1(self.conv1(x)))))
        return self.relu(out + identity)


class AudioResNet(nn.Module):
    """torchvision 2D ResNet (BasicBlock) with the reference's 1-channel
    7x7 stem swap and ``fc = Identity`` (model.py:103-121)."""

    def __init__(self, stage_blocks=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for i, (planes, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)], start=1
        ):
            blocks = [AudioBasicBlock(cin, planes, stride)]
            for _ in range(stage_blocks[i - 1] - 1):
                blocks.append(AudioBasicBlock(planes, planes, 1))
            setattr(self, f"layer{i}", nn.Sequential(*blocks))
            cin = planes
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))

    def forward(self, x):  # [B, 1, F, T]
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return self.avgpool(x).flatten(1)  # [B, 512]


class Unsqueeze(nn.Module):
    def forward(self, x):
        return x.unsqueeze(-1)


class MLPv2(nn.Module):
    """Reference MLPv2 head (model.py:62-91): Flatten/Dropout/Linear(no
    bias)/Unsqueeze/BatchNorm1d/Flatten/ReLU/Dropout/Linear."""

    def __init__(self, n_input, n_classes, n_hidden=512, p=0.3):
        super().__init__()
        self.block_forward = nn.Sequential(
            nn.Flatten(),
            nn.Dropout(p=p),
            nn.Linear(n_input, n_hidden, bias=False),
            Unsqueeze(),
            nn.BatchNorm1d(n_hidden),
            nn.Flatten(),
            nn.ReLU(inplace=True),
            nn.Dropout(p=p),
            nn.Linear(n_hidden, n_classes, bias=True),
        )

    def forward(self, x):
        return self.block_forward(x)


class _Base(nn.Module):
    def __init__(self, base):
        super().__init__()
        self.base = base

    def forward(self, x):
        return self.base(x)


class TorchAVModel(nn.Module):
    """Reference AVModel (model.py:169-253): towers + per-head MLPv2 (or
    Linear), names ``mlp_{v,a}{i}`` (bare ``mlp_v``/``mlp_a`` at
    headcount 1)."""

    def __init__(self, headcount=10, num_classes=309, use_mlp=True,
                 norm_feat=False, audio_stage_blocks=(1, 1, 1, 1)):
        super().__init__()
        self.hc = headcount
        self.norm_feat = norm_feat
        self.video_network = _Base(VideoResNetR2Plus1D18())
        self.audio_network = _Base(AudioResNet(audio_stage_blocks))

        def make_head():
            if use_mlp:
                return MLPv2(512, num_classes)
            return nn.Linear(512, num_classes)

        if headcount == 1:
            self.mlp_v = make_head()
            self.mlp_a = make_head()
        else:
            for i in range(headcount):
                setattr(self, f"mlp_v{i}", make_head())
                setattr(self, f"mlp_a{i}", make_head())

    def forward(self, video, spec):
        """video [B,3,T,H,W], spec [B,1,F,T] -> ([B,K] per head, same)."""
        fv = self.video_network(video)
        fa = self.audio_network(spec)
        outs_v, outs_a = [], []
        for i in range(self.hc):
            tag = "" if self.hc == 1 else str(i)
            ov = getattr(self, f"mlp_v{tag}")(fv)
            oa = getattr(self, f"mlp_a{tag}")(fa)
            if self.norm_feat:
                ov = torch.nn.functional.normalize(ov, p=2, dim=1)
                oa = torch.nn.functional.normalize(oa, p=2, dim=1)
            outs_v.append(ov)
            outs_a.append(oa)
        return outs_v, outs_a
