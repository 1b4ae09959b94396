"""Shared layers: torch-parity Conv/BN/pool wrappers for NHWC flax modules.

torchvision layers carry semantics flax defaults don't match (BN momentum
0.1-torch-style == 0.9-flax-style, explicit symmetric padding, count-include-pad
avg pooling). Centralizing them keeps every backbone file small and keeps
weight porting (models/torch_port.py) mechanical.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


class ConvT(nn.Module):
    """torch.nn.Conv2d equivalent: NHWC, HWIO kernel, symmetric int padding."""
    features: int
    kernel_size: int | tuple
    stride: int | tuple = 1
    padding: int | tuple = 0
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size if isinstance(self.kernel_size, tuple) else (self.kernel_size,) * 2
        s = self.stride if isinstance(self.stride, tuple) else (self.stride,) * 2
        p = self.padding if isinstance(self.padding, tuple) else (self.padding,) * 2
        return nn.Conv(self.features, k, strides=s,
                       padding=((p[0], p[0]), (p[1], p[1])),
                       feature_group_count=self.groups,
                       use_bias=self.use_bias, dtype=self.dtype,
                       name="conv")(x)


class BatchNormT(nn.Module):
    """torch.nn.BatchNorm2d defaults: eps=1e-5, torch momentum 0.1
    (flax momentum = 1 - 0.1 = 0.9). Running stats in the 'batch_stats'
    collection; scale/bias params in f32 regardless of compute dtype."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


def conv_bn(features, kernel_size, stride=1, padding=0, dtype=jnp.float32,
            name=None):
    """Convenience constructor pair used by inception/densenet/efficientnet."""
    return (partial(ConvT, features, kernel_size, stride, padding,
                    use_bias=False, dtype=dtype),
            partial(BatchNormT, dtype=dtype))


def max_pool(x, window, stride, padding=0):
    """torch MaxPool2d: symmetric padding with -inf fill."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, window, window, 1), (1, stride, stride, 1), pads)


def avg_pool(x, window, stride, padding=0, count_include_pad=True):
    """torch AvgPool2d (count_include_pad=True default)."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add,
                               (1, window, window, 1), (1, stride, stride, 1), pads)
    if count_include_pad:
        return summed / (window * window)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add,
                               (1, window, window, 1), (1, stride, stride, 1), pads)
    return summed / counts


def global_avg_pool(x):
    """AdaptiveAvgPool2d(1) + flatten: [B,H,W,C] -> [B,C]."""
    return jnp.mean(x, axis=(1, 2))


def adaptive_avg_pool(x, out_hw: int):
    """AdaptiveAvgPool2d(out_hw) for out sizes that divide H,W evenly (the
    torchvision classification-path cases: e.g. 6x6 from 36, 7x7 from 7)."""
    b, h, w, c = x.shape
    if h == out_hw and w == out_hw:
        return x
    assert h % out_hw == 0 and w % out_hw == 0, (h, w, out_hw)
    x = x.reshape(b, out_hw, h // out_hw, out_hw, w // out_hw, c)
    return x.mean(axis=(2, 4))
