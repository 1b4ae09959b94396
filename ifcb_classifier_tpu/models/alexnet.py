"""AlexNet (torchvision structure) in Flax NHWC.

Reference head surgery: classifier[6] → Linear(4096, n_classes)
(/root/reference/neuston_models.py:27-29); here the head is sized directly.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvT, adaptive_avg_pool, max_pool


class AlexNet(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.relu(ConvT(64, 11, 4, 2, dtype=self.dtype, name="features_0")(x))
        x = max_pool(x, 3, 2)
        x = nn.relu(ConvT(192, 5, 1, 2, dtype=self.dtype, name="features_3")(x))
        x = max_pool(x, 3, 2)
        x = nn.relu(ConvT(384, 3, 1, 1, dtype=self.dtype, name="features_6")(x))
        x = nn.relu(ConvT(256, 3, 1, 1, dtype=self.dtype, name="features_8")(x))
        x = nn.relu(ConvT(256, 3, 1, 1, dtype=self.dtype, name="features_10")(x))
        x = max_pool(x, 3, 2)
        x = adaptive_avg_pool(x, 6)
        # flatten in torch CHW order so ported fc weights line up
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="classifier_1")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="classifier_4")(x))
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier_6")(x)
        return x.astype(jnp.float32)
