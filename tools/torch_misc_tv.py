"""Pure-torch AlexNet / DenseNet-121 / SqueezeNet1.1 / EfficientNet-B0 with
EXACT torchvision module names (state_dict key-compatible), for the
cross-framework parity tests — see tools/torch_inception_tv.py."""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class AlexNet(nn.Module):
    def __init__(self, num_classes=5):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2))
        self.classifier = nn.Sequential(
            nn.Dropout(), nn.Linear(256 * 36, 4096), nn.ReLU(inplace=True),
            nn.Dropout(), nn.Linear(4096, 4096), nn.ReLU(inplace=True),
            nn.Linear(4096, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = F.adaptive_avg_pool2d(x, 6).flatten(1)
        return self.classifier(x)


class _DenseLayer(nn.Module):
    def __init__(self, in_ch, growth, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                               bias=False)

    def forward(self, x):
        out = self.conv1(torch.relu(self.norm1(x)))
        out = self.conv2(torch.relu(self.norm2(out)))
        return torch.cat([x, out], 1)


class DenseNet121(nn.Module):
    def __init__(self, num_classes=5):
        super().__init__()
        growth, cfg, ch = 32, (6, 12, 24, 16), 64
        features = nn.Sequential()
        features.add_module("conv0", nn.Conv2d(3, ch, 7, 2, 3, bias=False))
        features.add_module("norm0", nn.BatchNorm2d(ch))
        for b, n_layers in enumerate(cfg):
            block = nn.Sequential()
            for i in range(n_layers):
                block.add_module(f"denselayer{i + 1}",
                                 _DenseLayer(ch + i * growth, growth))
            features.add_module(f"denseblock{b + 1}", block)
            ch += n_layers * growth
            if b != len(cfg) - 1:
                trans = nn.Sequential()
                trans.add_module("norm", nn.BatchNorm2d(ch))
                trans.add_module("conv", nn.Conv2d(ch, ch // 2, 1, bias=False))
                features.add_module(f"transition{b + 1}", trans)
                ch //= 2
        features.add_module("norm5", nn.BatchNorm2d(ch))
        self.features = features
        self.classifier = nn.Linear(ch, num_classes)

    def forward(self, x):
        f = self.features
        x = torch.relu(f.norm0(f.conv0(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for b in range(4):
            block = getattr(f, f"denseblock{b + 1}")
            for layer in block:
                x = layer(x)
            if b != 3:
                t = getattr(f, f"transition{b + 1}")
                x = t.conv(torch.relu(t.norm(x)))
                x = F.avg_pool2d(x, 2, 2)
        x = torch.relu(f.norm5(x))
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.classifier(x)


class _Fire(nn.Module):
    def __init__(self, i, s, e1, e3):
        super().__init__()
        self.squeeze = nn.Conv2d(i, s, 1)
        self.expand1x1 = nn.Conv2d(s, e1, 1)
        self.expand3x3 = nn.Conv2d(s, e3, 3, padding=1)

    def forward(self, x):
        x = torch.relu(self.squeeze(x))
        return torch.cat([torch.relu(self.expand1x1(x)),
                          torch.relu(self.expand3x3(x))], 1)


class SqueezeNet11(nn.Module):
    def __init__(self, num_classes=5):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 3, 2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            _Fire(64, 16, 64, 64), _Fire(128, 16, 64, 64),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            _Fire(128, 32, 128, 128), _Fire(256, 32, 128, 128),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            _Fire(256, 48, 192, 192), _Fire(384, 48, 192, 192),
            _Fire(384, 64, 256, 256), _Fire(512, 64, 256, 256))
        self.classifier = nn.Sequential(
            nn.Dropout(0.5), nn.Conv2d(512, num_classes, 1),
            nn.ReLU(inplace=True), nn.AdaptiveAvgPool2d(1))

    def forward(self, x):
        return self.classifier(self.features(x)).flatten(1)


class _SE(nn.Module):
    def __init__(self, in_ch, squeeze_ch):
        super().__init__()
        self.fc1 = nn.Conv2d(in_ch, squeeze_ch, 1)
        self.fc2 = nn.Conv2d(squeeze_ch, in_ch, 1)

    def forward(self, x):
        s = F.adaptive_avg_pool2d(x, 1)
        return x * torch.sigmoid(self.fc2(F.silu(self.fc1(s))))


def _cna(i, o, k, s, groups=1):  # Conv2dNormActivation (SiLU)
    # b0 uses torchvision's BatchNorm2d DEFAULTS (eps=1e-5, momentum=0.1);
    # only b5-b7 override to (1e-3, 0.01) in torchvision's builders
    return nn.Sequential(
        nn.Conv2d(i, o, k, s, k // 2, groups=groups, bias=False),
        nn.BatchNorm2d(o), nn.SiLU(inplace=True))


class _MBConv(nn.Module):
    def __init__(self, er, k, s, i, o):
        super().__init__()
        mid = i * er
        layers = []
        if er != 1:
            layers.append(_cna(i, mid, 1, 1))
        layers.append(_cna(mid, mid, k, s, groups=mid))
        layers.append(_SE(mid, max(1, i // 4)))
        layers.append(nn.Sequential(
            nn.Conv2d(mid, o, 1, bias=False),
            nn.BatchNorm2d(o)))
        self.block = nn.Sequential(*layers)
        self.residual = (s == 1 and i == o)

    def forward(self, x):
        out = self.block(x)
        return out + x if self.residual else out


class EfficientNetB0(nn.Module):
    STAGES = ((1, 3, 1, 32, 16, 1), (6, 3, 2, 16, 24, 2),
              (6, 5, 2, 24, 40, 2), (6, 3, 2, 40, 80, 3),
              (6, 5, 1, 80, 112, 3), (6, 5, 2, 112, 192, 4),
              (6, 3, 1, 192, 320, 1))

    def __init__(self, num_classes=5):
        super().__init__()
        feats = [_cna(3, 32, 3, 2)]
        for er, k, s, ci, co, reps in self.STAGES:
            stage = []
            for r in range(reps):
                stage.append(_MBConv(er, k, s if r == 0 else 1,
                                     ci if r == 0 else co, co))
            feats.append(nn.Sequential(*stage))
        feats.append(_cna(320, 1280, 1, 1))
        self.features = nn.Sequential(*feats)
        self.classifier = nn.Sequential(nn.Dropout(0.2),
                                        nn.Linear(1280, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.classifier(x)


class VGG11(nn.Module):
    def __init__(self, num_classes=5):
        super().__init__()
        layers, in_ch = [], 3
        for v in (64, "M", 128, "M", 256, 256, "M", 512, 512, "M",
                  512, 512, "M"):
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_ch, v, 3, padding=1),
                           nn.ReLU(inplace=True)]
                in_ch = v
        self.features = nn.Sequential(*layers)
        self.classifier = nn.Sequential(
            nn.Linear(512 * 49, 4096), nn.ReLU(inplace=True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(inplace=True), nn.Dropout(),
            nn.Linear(4096, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = F.adaptive_avg_pool2d(x, 7).flatten(1)
        return self.classifier(x)
