"""DenseNet-121/161/169/201 in Flax NHWC, torchvision structure.

Reference head surgery: classifier → Linear(in, n_classes)
(/root/reference/neuston_models.py:40-42).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNormT, ConvT, avg_pool, global_avg_pool, max_pool

# variant: (growth_rate, block_config, num_init_features)
DENSENET_CFGS = {
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
}


class DenseLayer(nn.Module):
    growth_rate: int
    dtype: Any = jnp.float32
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        out = BatchNormT(dtype=self.dtype, name="norm1")(x, train)
        out = nn.relu(out)
        out = ConvT(self.bn_size * self.growth_rate, 1, use_bias=False,
                    dtype=self.dtype, name="conv1")(out)
        out = BatchNormT(dtype=self.dtype, name="norm2")(out, train)
        out = nn.relu(out)
        out = ConvT(self.growth_rate, 3, 1, 1, use_bias=False,
                    dtype=self.dtype, name="conv2")(out)
        return jnp.concatenate([x, out], axis=-1)


class DenseNet(nn.Module):
    variant: str = "densenet121"
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        growth, block_config, init_features = DENSENET_CFGS[self.variant]
        x = x.astype(self.dtype)
        x = ConvT(init_features, 7, 2, 3, use_bias=False, dtype=self.dtype,
                  name="conv0")(x)
        x = BatchNormT(dtype=self.dtype, name="norm0")(x, train)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, 1)

        features = init_features
        for b, n_layers in enumerate(block_config):
            for i in range(n_layers):
                x = DenseLayer(growth, self.dtype,
                               name=f"denseblock{b + 1}_layer{i + 1}")(x, train)
            features += n_layers * growth
            if b != len(block_config) - 1:
                x = BatchNormT(dtype=self.dtype,
                               name=f"transition{b + 1}_norm")(x, train)
                x = nn.relu(x)
                features //= 2
                x = ConvT(features, 1, use_bias=False, dtype=self.dtype,
                          name=f"transition{b + 1}_conv")(x)
                x = avg_pool(x, 2, 2)

        x = BatchNormT(dtype=self.dtype, name="norm5")(x, train)
        x = nn.relu(x)
        x = global_avg_pool(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)
        return x.astype(jnp.float32)
