"""ResNet-18/34/50/101/152 in Flax (NHWC), torchvision-parity structure.

The reference consumes these via `get_namebrand_model('resnet*', ...)` with fc
head surgery (/root/reference/neuston_models.py:37-39). Module names mirror
the torch state_dict (conv1/bn1/layer{1-4}/{idx}/conv{n}/downsample/fc) so
weight porting is a mechanical rename (models/torch_port.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNormT, ConvT, global_avg_pool, max_pool

RESNET_CFGS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    fold: bool = False  # eval-only BN→conv folding (models/fold.py)

    @nn.compact
    def __call__(self, x, train: bool):
        f = self.fold
        identity = x
        out = ConvT(self.planes, 3, self.stride, 1, use_bias=f,
                    dtype=self.dtype, name="conv1")(x)
        if not f:
            out = BatchNormT(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = ConvT(self.planes, 3, 1, 1, use_bias=f,
                    dtype=self.dtype, name="conv2")(out)
        if not f:
            out = BatchNormT(dtype=self.dtype, name="bn2")(out, train)
        if self.downsample:
            identity = ConvT(self.planes, 1, self.stride, 0, use_bias=f,
                             dtype=self.dtype, name="ds_conv")(x)
            if not f:
                identity = BatchNormT(dtype=self.dtype,
                                      name="ds_bn")(identity, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4
    fold: bool = False  # eval-only BN→conv folding (models/fold.py)

    @nn.compact
    def __call__(self, x, train: bool):
        f = self.fold
        identity = x
        out = ConvT(self.planes, 1, 1, 0, use_bias=f,
                    dtype=self.dtype, name="conv1")(x)
        if not f:
            out = BatchNormT(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = ConvT(self.planes, 3, self.stride, 1, use_bias=f,
                    dtype=self.dtype, name="conv2")(out)
        if not f:
            out = BatchNormT(dtype=self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = ConvT(self.planes * self.expansion, 1, 1, 0, use_bias=f,
                    dtype=self.dtype, name="conv3")(out)
        if not f:
            out = BatchNormT(dtype=self.dtype, name="bn3")(out, train)
        if self.downsample:
            identity = ConvT(self.planes * self.expansion, 1, self.stride, 0,
                             use_bias=f, dtype=self.dtype, name="ds_conv")(x)
            if not f:
                identity = BatchNormT(dtype=self.dtype,
                                      name="ds_bn")(identity, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    variant: str = "resnet18"
    num_classes: int = 1000
    dtype: Any = jnp.float32
    fold: bool = False  # eval-only BN→conv folding (models/fold.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold and train:
            raise ValueError("fold_bn model is eval-only (BN is folded "
                             "into conv weights with frozen stats)")
        block_kind, stage_sizes = RESNET_CFGS[self.variant]
        block_cls = BasicBlock if block_kind == "basic" else Bottleneck
        expansion = 1 if block_kind == "basic" else 4

        x = x.astype(self.dtype)
        x = ConvT(64, 7, 2, 3, use_bias=self.fold, dtype=self.dtype,
                  name="conv1")(x)
        if not self.fold:
            x = BatchNormT(dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, 1)

        in_planes = 64
        for stage, n_blocks in enumerate(stage_sizes):
            planes = 64 * (2 ** stage)
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                needs_ds = (stride != 1) or (in_planes != planes * expansion)
                x = block_cls(planes=planes, stride=stride, downsample=needs_ds,
                              dtype=self.dtype, fold=self.fold,
                              name=f"layer{stage + 1}_{i}")(x, train)
                in_planes = planes * expansion

        x = global_avg_pool(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x.astype(jnp.float32)
