"""VGG-11/13/16/19 (±BN) in Flax NHWC, torchvision structure.

Reference head surgery: classifier[6] → Linear(4096, n_classes)
(/root/reference/neuston_models.py:34-36).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNormT, ConvT, adaptive_avg_pool, max_pool

VGG_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    cfg: str = "vgg16"
    batch_norm: bool = False
    num_classes: int = 1000
    dtype: Any = jnp.float32
    fold: bool = False  # eval-only BN→conv folding (models/fold.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold and train:
            raise ValueError("fold_bn model is eval-only (BN is folded "
                             "into conv weights with frozen stats)")
        x = x.astype(self.dtype)
        layer_idx = 0
        for v in VGG_CFGS[self.cfg]:
            if v == "M":
                x = max_pool(x, 2, 2)
                layer_idx += 1
            else:
                x = ConvT(v, 3, 1, 1, dtype=self.dtype,
                          name=f"features_{layer_idx}")(x)
                layer_idx += 1
                if self.batch_norm:
                    if not self.fold:  # folded: BN absent, numbering kept
                        x = BatchNormT(dtype=self.dtype,
                                       name=f"features_{layer_idx}")(x, train)
                    layer_idx += 1
                x = nn.relu(x)
                layer_idx += 1
        x = adaptive_avg_pool(x, 7)
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)  # torch CHW flatten
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="classifier_0")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="classifier_3")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier_6")(x)
        return x.astype(jnp.float32)
