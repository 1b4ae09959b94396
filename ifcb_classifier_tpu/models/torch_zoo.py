"""First-party pure-torch model zoo with EXACT torchvision module names.

Two product roles (plus the parity-test role the tools/ shims keep):

1. Genuine `.onnx` deployment artifacts. The reference exports its models
   with `torch.onnx.export` (/root/reference/neuston_onnx.py:44-58) and
   sites consume them with onnxruntime (:68-107). Our compute path is JAX,
   but the trained weights round-trip losslessly through
   models/torch_port.py `export_state_dict` into these modules, whose
   forward semantics are pinned to the flax implementations by
   tests/test_torch_parity.py — so `ifcbnn-export EXPORT --format onnx`
   produces an artifact byte-compatible with the reference deployment
   pipeline (export.py:export_onnx).
2. Handing weights back to torch users (`state_dict()` of a loaded zoo
   module is torchvision-layout).

Every family `get_namebrand_model` dispatches on is covered
(models/__init__.py MODEL_FAMILIES): inception_v3 (+aux head, optional
transform_input), alexnet, squeezenet(1_1), vgg11/13/16/19(±bn),
resnet18/34/50/101/152, densenet121/161/169/201, efficientnet_b0-b7.
Only torch (CPU) is required — no torchvision, no network.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

# ---------------------------------------------------------------- inception

class BasicConv2d(nn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = nn.Conv2d(i, o, bias=False, **kw)
        self.bn = nn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class InceptionA(nn.Module):
    def __init__(self, i, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(i, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(i, pool_features, kernel_size=1)

    def forward(self, x):
        p = F.avg_pool2d(x, 3, 1, 1)
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(p)], 1)


class InceptionB(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = BasicConv2d(i, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2)], 1)


class InceptionC(nn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(i, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(i, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        p = F.avg_pool2d(x, 3, 1, 1)
        return torch.cat([
            self.branch1x1(x),
            self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x))),
            self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x))))),
            self.branch_pool(p)], 1)


class InceptionD(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, 2)], 1)


class InceptionE(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch1x1 = BasicConv2d(i, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(i, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(i, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        p = F.avg_pool2d(x, 3, 1, 1)
        return torch.cat([
            self.branch1x1(x),
            torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1),
            torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1),
            self.branch_pool(p)], 1)


class InceptionAux(nn.Module):
    def __init__(self, i, n):
        super().__init__()
        self.conv0 = BasicConv2d(i, 128, kernel_size=1)
        self.conv1 = BasicConv2d(128, 768, kernel_size=5)
        self.fc = nn.Linear(768, n)

    def forward(self, x):
        x = F.avg_pool2d(x, 5, 3)
        x = self.conv1(self.conv0(x))
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.fc(x)


class Inception3(nn.Module):
    """torchvision-key-compatible Inception3.

    Training mode returns `(logits, aux_logits)` (the 2-tuple the
    reference's aux-loss rule consumes, neuston_models.py:70-78); eval
    mode returns plain logits — exactly torchvision's Inception3 contract,
    which is what `torch.onnx.export` of an `.eval()` model traces
    (neuston_onnx.py:23,49)."""

    def __init__(self, num_classes=50, dropout=0.5, transform_input=False):
        super().__init__()
        self.dropout = dropout
        # torchvision: inception_v3(pretrained=True) forces
        # transform_input=True — ImageNet-stat channel renormalization
        # applied inside the model, at train AND eval time
        self.transform_input = transform_input
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.AuxLogits = InceptionAux(768, num_classes)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280)
        self.Mixed_7c = InceptionE(2048)
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        if self.transform_input:
            ch0 = x[:, 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[:, 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[:, 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = torch.cat((ch0, ch1, ch2), 1)
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
        x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(
            self.Mixed_6a(x)))))
        aux = self.AuxLogits(x) if self.training else None
        x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        x = self.fc(F.dropout(x, self.dropout, self.training))
        return (x, aux) if self.training else x


# ------------------------------------------------------------------ resnet

class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return torch.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return torch.relu(out + identity)


# mirrors models/resnet.py RESNET_CFGS (torchvision variants)
_RESNET_CFGS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
    "resnet101": (Bottleneck, (3, 4, 23, 3)),
    "resnet152": (Bottleneck, (3, 8, 36, 3)),
}


class ResNet(nn.Module):
    def __init__(self, variant="resnet18", num_classes=5):
        super().__init__()
        block_cls, stage_sizes = _RESNET_CFGS[variant]
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        inplanes = 64
        for stage, n_blocks in enumerate(stage_sizes):
            planes = 64 * (2 ** stage)
            blocks = []
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                ds = None
                if stride != 1 or inplanes != planes * block_cls.expansion:
                    ds = nn.Sequential(
                        nn.Conv2d(inplanes, planes * block_cls.expansion, 1,
                                  stride, bias=False),
                        nn.BatchNorm2d(planes * block_cls.expansion))
                blocks.append(block_cls(inplanes, planes, stride, ds))
                inplanes = planes * block_cls.expansion
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(inplanes, num_classes)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.fc(x)


# -------------------------------------------------------------------- vgg

# mirrors models/vgg.py VGG_CFGS (torchvision cfgs A/B/D/E)
_VGG_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    def __init__(self, variant="vgg16", num_classes=5):
        super().__init__()
        cfg = _VGG_CFGS[variant.replace("_bn", "")]
        batch_norm = variant.endswith("_bn")
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
                if batch_norm:
                    layers.append(nn.BatchNorm2d(v))
                layers.append(nn.ReLU(inplace=True))
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


# ---------------------------------------------------------------- alexnet

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


# -------------------------------------------------------------- squeezenet

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


# ---------------------------------------------------------------- densenet

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


# mirrors models/densenet.py DENSENET_CFGS
_DENSENET_CFGS = {
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
}


class DenseNet(nn.Module):
    def __init__(self, variant="densenet121", num_classes=5):
        super().__init__()
        growth, cfg, ch = _DENSENET_CFGS[variant]
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
        self.n_blocks = len(cfg)
        self.classifier = nn.Linear(ch, num_classes)

    def forward(self, x):
        f = self.features
        x = torch.relu(f.norm0(f.conv0(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for b in range(self.n_blocks):
            block = getattr(f, f"denseblock{b + 1}")
            for layer in block:
                x = layer(x)
            if b != self.n_blocks - 1:
                t = getattr(f, f"transition{b + 1}")
                x = t.conv(torch.relu(t.norm(x)))
                x = F.avg_pool2d(x, 2, 2)
        x = torch.relu(f.norm5(x))
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.classifier(x)


# ------------------------------------------------------------ efficientnet

class _SE(nn.Module):
    def __init__(self, in_ch, squeeze_ch):
        super().__init__()
        self.fc1 = nn.Conv2d(in_ch, squeeze_ch, 1)
        self.fc2 = nn.Conv2d(squeeze_ch, in_ch, 1)

    def forward(self, x):
        s = F.adaptive_avg_pool2d(x, 1)
        return x * torch.sigmoid(self.fc2(F.silu(self.fc1(s))))


def _cna(i, o, k, s, groups=1, bn_eps=1e-5, bn_mom=0.1):
    # Conv2dNormActivation (SiLU); BN hyperparams per variant — b0-b4 use
    # the BatchNorm2d DEFAULTS, b5-b7 override to (1e-3, 0.01)
    # (models/efficientnet.py bn_params_for)
    return nn.Sequential(
        nn.Conv2d(i, o, k, s, k // 2, groups=groups, bias=False),
        nn.BatchNorm2d(o, eps=bn_eps, momentum=bn_mom), nn.SiLU(inplace=True))


class _MBConv(nn.Module):
    def __init__(self, er, k, s, i, o, bn_eps=1e-5, bn_mom=0.1,
                 sd_prob=0.0):
        super().__init__()
        mid = i * er
        layers = []
        if er != 1:
            layers.append(_cna(i, mid, 1, 1, bn_eps=bn_eps, bn_mom=bn_mom))
        layers.append(_cna(mid, mid, k, s, groups=mid, bn_eps=bn_eps,
                           bn_mom=bn_mom))
        layers.append(_SE(mid, max(1, i // 4)))
        layers.append(nn.Sequential(
            nn.Conv2d(mid, o, 1, bias=False),
            nn.BatchNorm2d(o, eps=bn_eps, momentum=bn_mom)))
        self.block = nn.Sequential(*layers)
        self.residual = (s == 1 and i == o)
        self.sd_prob = sd_prob  # parameterless: state_dict layout unchanged

    def forward(self, x):
        out = self.block(x)
        if not self.residual:
            return out
        if self.training and self.sd_prob > 0:
            # per-sample ("row") stochastic depth, the torchvision MBConv
            # regularizer and the flax twin's (models/efficientnet.py:123):
            # identity in eval, so ONNX export and inference are unaffected
            keep = 1.0 - self.sd_prob
            mask = torch.empty((x.shape[0], 1, 1, 1), dtype=out.dtype,
                               device=out.device).bernoulli_(keep)
            out = out * mask / keep
        return out + x


# mirrors models/efficientnet.py EFFICIENTNET_CFGS / _BASE_STAGES
# (width_mult, depth_mult, classifier dropout — the per-variant rate
# torchvision uses; a torch user fine-tuning a handed-back module must get
# the same regularization as the flax model and torchvision, not a flat 0.2)
_EFFICIENTNET_CFGS = {
    "efficientnet_b0": (1.0, 1.0, 0.2), "efficientnet_b1": (1.0, 1.1, 0.2),
    "efficientnet_b2": (1.1, 1.2, 0.3), "efficientnet_b3": (1.2, 1.4, 0.3),
    "efficientnet_b4": (1.4, 1.8, 0.4), "efficientnet_b5": (1.6, 2.2, 0.4),
    "efficientnet_b6": (1.8, 2.6, 0.5), "efficientnet_b7": (2.0, 3.1, 0.5),
}
_EFF_BASE_STAGES = (  # (expand_ratio, kernel, stride, out_ch, repeats)
    (1, 3, 1, 16, 1), (6, 3, 2, 24, 2), (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3), (6, 5, 1, 112, 3), (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1))


def _round_filters(c, width_mult, divisor=8):
    c *= width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


class EfficientNet(nn.Module):
    def __init__(self, variant="efficientnet_b0", num_classes=5):
        super().__init__()
        width, depth, dropout = _EFFICIENTNET_CFGS[variant]
        bn_eps, bn_mom = ((1e-3, 0.01) if variant in (
            "efficientnet_b5", "efficientnet_b6", "efficientnet_b7")
            else (1e-5, 0.1))
        stem = _round_filters(32, width)
        feats = [_cna(3, stem, 3, 2, bn_eps=bn_eps, bn_mom=bn_mom)]
        in_ch = stem
        total_blocks = sum(int(math.ceil(depth * reps))
                           for *_, reps in _EFF_BASE_STAGES)
        block_idx = 0
        for er, k, s, c_out, reps in _EFF_BASE_STAGES:
            out_ch = _round_filters(c_out, width)
            stage = []
            for r in range(int(math.ceil(depth * reps))):
                # 0.2 linearly scaled over the global block index — the
                # torchvision survival schedule, same as the flax model
                stage.append(_MBConv(er, k, s if r == 0 else 1,
                                     in_ch if r == 0 else out_ch, out_ch,
                                     bn_eps=bn_eps, bn_mom=bn_mom,
                                     sd_prob=0.2 * block_idx / total_blocks))
                block_idx += 1
            in_ch = out_ch
            feats.append(nn.Sequential(*stage))
        head = 4 * in_ch
        feats.append(_cna(in_ch, head, 1, 1, bn_eps=bn_eps, bn_mom=bn_mom))
        self.features = nn.Sequential(*feats)
        self.classifier = nn.Sequential(nn.Dropout(dropout),
                                        nn.Linear(head, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.classifier(x)


# ---------------------------------------------------------------- dispatch

def build_torch_model(family: str, num_classes: int,
                      transform_input: bool = False) -> nn.Module:
    """name → torch Module, torchvision state_dict layout; the torch twin
    of models/__init__.py get_namebrand_model (same families, same head
    surgery). `transform_input` only applies to inception_v3 (the
    pretrained-factory rule torchvision bakes into the model)."""
    if family == "inception_v3":
        return Inception3(num_classes=num_classes,
                          transform_input=transform_input)
    if family == "alexnet":
        return AlexNet(num_classes)
    if family == "squeezenet":
        return SqueezeNet11(num_classes)
    if family.startswith("vgg") and family.replace("_bn", "") in _VGG_CFGS:
        return VGG(family, num_classes)
    if family in _RESNET_CFGS:
        return ResNet(family, num_classes)
    if family in _DENSENET_CFGS:
        return DenseNet(family, num_classes)
    if family in _EFFICIENTNET_CFGS:
        return EfficientNet(family, num_classes)
    raise KeyError("model unknown!")


def load_flax_weights(model: nn.Module, family: str, params,
                      batch_stats) -> nn.Module:
    """Fill a zoo module from our flax trees via torch_port.export_state_dict.
    Strict on both directions except BatchNorm's num_batches_tracked buffer
    (a torch-only training counter our checkpoints don't carry)."""
    from .torch_port import export_state_dict

    sd = {k: torch.from_numpy(v.copy())
          for k, v in export_state_dict(family, params, batch_stats).items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    bad = [k for k in missing if not k.endswith("num_batches_tracked")]
    if bad or unexpected:
        raise ValueError(
            f"flax→torch port mismatch for {family}: missing={bad[:5]} "
            f"unexpected={list(unexpected)[:5]} — refusing a partial port")
    return model
