"""SqueezeNet 1.1 in Flax NHWC, torchvision structure.

The reference maps 'squeezenet' → squeezenet1_1 with a Conv2d classifier head
(/root/reference/neuston_models.py:30-33); here the 1x1 classifier conv is
sized directly.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from .layers import ConvT, global_avg_pool


def _max_pool_ceil(x, window=3, stride=2):
    """torch MaxPool2d(ceil_mode=True): pad right/bottom so the last window fits."""
    _, h, w, _ = x.shape
    def pad_for(n):
        out = -(-(n - window) // stride) + 1  # ceil
        return max(0, (out - 1) * stride + window - n)
    ph, pw = pad_for(h), pad_for(w)
    pads = ((0, 0), (0, ph), (0, pw), (0, 0))
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, window, window, 1), (1, stride, stride, 1), pads)


class Fire(nn.Module):
    squeeze: int
    expand1x1: int
    expand3x3: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = nn.relu(ConvT(self.squeeze, 1, dtype=self.dtype, name="squeeze")(x))
        e1 = nn.relu(ConvT(self.expand1x1, 1, dtype=self.dtype, name="expand1x1")(s))
        e3 = nn.relu(ConvT(self.expand3x3, 3, 1, 1, dtype=self.dtype,
                           name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNet11(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.relu(ConvT(64, 3, 2, 0, dtype=self.dtype, name="features_0")(x))
        x = _max_pool_ceil(x)
        x = Fire(16, 64, 64, self.dtype, name="features_3")(x)
        x = Fire(16, 64, 64, self.dtype, name="features_4")(x)
        x = _max_pool_ceil(x)
        x = Fire(32, 128, 128, self.dtype, name="features_6")(x)
        x = Fire(32, 128, 128, self.dtype, name="features_7")(x)
        x = _max_pool_ceil(x)
        x = Fire(48, 192, 192, self.dtype, name="features_9")(x)
        x = Fire(48, 192, 192, self.dtype, name="features_10")(x)
        x = Fire(64, 256, 256, self.dtype, name="features_11")(x)
        x = Fire(64, 256, 256, self.dtype, name="features_12")(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(ConvT(self.num_classes, 1, dtype=self.dtype,
                          name="classifier_1")(x))
        x = global_avg_pool(x)
        return x.astype(jnp.float32)
