"""EfficientNet-B0..B7 (v1, torchvision structure) in Flax NHWC.

Not in the reference zoo (torchvision 0.8.2 predates it) but required by
BASELINE.json config #3 ("EfficientNet-B4 / DenseNet121 alternate backbones").
MBConv with squeeze-excitation, SiLU, BN(eps=1e-3, torch momentum 0.01),
per-sample stochastic depth (0.2 linearly scaled over blocks). BN eps/
momentum follow torchvision exactly: defaults for b0-b4, (1e-3, 0.01) for
b5-b7 only.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ConvT, TorchBN, global_avg_pool

# variant: (width_mult, depth_mult, dropout)
EFFICIENTNET_CFGS = {
    "efficientnet_b0": (1.0, 1.0, 0.2),
    "efficientnet_b1": (1.0, 1.1, 0.2),
    "efficientnet_b2": (1.1, 1.2, 0.3),
    "efficientnet_b3": (1.2, 1.4, 0.3),
    "efficientnet_b4": (1.4, 1.8, 0.4),
    "efficientnet_b5": (1.6, 2.2, 0.4),
    "efficientnet_b6": (1.8, 2.6, 0.5),
    "efficientnet_b7": (2.0, 3.1, 0.5),
}

# base MBConv stages: (expand_ratio, kernel, stride, out_ch, repeats).
# Input channels are threaded dynamically (rounded previous out_ch), so the
# config cannot silently disagree with the actual wiring.
_BASE_STAGES = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)


def round_filters(c: float, width_mult: float, divisor: int = 8) -> int:
    c *= width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


def round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


# torchvision BN hyperparameters differ by variant: b0-b4 use the
# BatchNorm2d DEFAULTS (eps=1e-5, momentum=0.1); only b5/b6/b7 pass
# partial(BatchNorm2d, eps=1e-3, momentum=0.01) (torchvision
# models/efficientnet.py builders) — getting this wrong skews activations
# for ported real weights on channels with small running_var
def bn_params_for(variant: str):
    return ((1e-3, 0.01) if variant in ("efficientnet_b5", "efficientnet_b6",
                                        "efficientnet_b7")
            else (1e-5, 0.1))


class _BN(nn.Module):
    dtype: Any = jnp.float32
    epsilon: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train):
        return TorchBN(momentum=self.momentum, epsilon=self.epsilon,
                       dtype=self.dtype,
                       name="bn")(x, use_running_average=not train)


class MBConv(nn.Module):
    expand_ratio: int
    kernel: int
    stride: int
    in_ch: int
    out_ch: int
    sd_prob: float
    dtype: Any = jnp.float32
    bn_eps: float = 1e-5
    bn_mom: float = 0.1
    fold: bool = False  # eval-only BN→conv folding (models/fold.py)

    @nn.compact
    def __call__(self, x, train: bool):
        d, f = self.dtype, self.fold
        expanded = self.in_ch * self.expand_ratio
        h = x
        if self.expand_ratio != 1:
            h = ConvT(expanded, 1, use_bias=f, dtype=d, name="expand_conv")(h)
            if not f:
                h = _BN(d, self.bn_eps, self.bn_mom,
                        name="expand_bn")(h, train)
            h = nn.silu(h)
        h = ConvT(expanded, self.kernel, self.stride, self.kernel // 2,
                  groups=expanded, use_bias=f, dtype=d, name="dw_conv")(h)
        if not f:
            h = _BN(d, self.bn_eps, self.bn_mom,
                    name="dw_bn")(h, train)
        h = nn.silu(h)
        # squeeze-excitation on block *input* channel count / 4
        sq = max(1, self.in_ch // 4)
        s = global_avg_pool(h)[:, None, None, :]
        s = nn.silu(ConvT(sq, 1, dtype=d, name="se_reduce")(s))
        s = nn.sigmoid(ConvT(expanded, 1, dtype=d, name="se_expand")(s))
        h = h * s
        h = ConvT(self.out_ch, 1, use_bias=f, dtype=d, name="project_conv")(h)
        if not f:
            h = _BN(d, self.bn_eps, self.bn_mom,
                    name="project_bn")(h, train)
        if self.stride == 1 and self.in_ch == self.out_ch:
            if train and self.sd_prob > 0:
                keep = 1.0 - self.sd_prob
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (h.shape[0], 1, 1, 1))
                h = h * mask.astype(h.dtype) / keep
            h = h + x
        return h


class EfficientNet(nn.Module):
    variant: str = "efficientnet_b0"
    num_classes: int = 1000
    dtype: Any = jnp.float32
    fold: bool = False  # eval-only BN→conv folding (models/fold.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold and train:
            raise ValueError("fold_bn model is eval-only (BN is folded "
                             "into conv weights with frozen stats)")
        width, depth, dropout = EFFICIENTNET_CFGS[self.variant]
        bn_eps, bn_mom = bn_params_for(self.variant)
        d, f = self.dtype, self.fold
        x = x.astype(d)

        stem = round_filters(32, width)
        x = ConvT(stem, 3, 2, 1, use_bias=f, dtype=d, name="stem_conv")(x)
        if not f:
            x = _BN(d, bn_eps, bn_mom, name="stem_bn")(x, train)
        x = nn.silu(x)

        total_blocks = sum(round_repeats(r, depth) for *_, r in _BASE_STAGES)
        block_idx = 0
        in_ch = stem
        for s_idx, (er, k, s, c_out, r) in enumerate(_BASE_STAGES):
            out_ch = round_filters(c_out, width)
            for i in range(round_repeats(r, depth)):
                stride = s if i == 0 else 1
                sd = 0.2 * block_idx / total_blocks
                x = MBConv(er, k, stride, in_ch, out_ch, sd, d,
                           bn_eps, bn_mom, fold=f,
                           name=f"block{s_idx}_{i}")(x, train)
                in_ch = out_ch
                block_idx += 1

        head = 4 * in_ch
        x = ConvT(head, 1, use_bias=f, dtype=d, name="head_conv")(x)
        if not f:
            x = _BN(d, bn_eps, bn_mom, name="head_bn")(x, train)
        x = nn.silu(x)
        x = global_avg_pool(x)
        x = nn.Dropout(dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=d, name="classifier")(x)
        return x.astype(jnp.float32)
