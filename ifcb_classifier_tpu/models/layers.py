"""Shared layers: torch-parity Conv/BN/pool wrappers for NHWC flax modules.

torchvision layers carry semantics flax defaults don't match (BN momentum
0.1-torch-style == 0.9-flax-style, explicit symmetric padding, count-include-pad
avg pooling). Centralizing them keeps every backbone file small and keeps
weight porting (models/torch_port.py) mechanical.
"""

from __future__ import annotations

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


class TorchBN(nn.Module):
    """torch.nn.BatchNorm2d-exact batch norm.

    flax's nn.BatchNorm updates running_var with the BIASED batch variance;
    torch uses the UNBIASED one (×n/(n-1), torch _BatchNorm.forward). The
    difference is ~1/n per step — invisible at batch 108 on big feature maps
    but a real trajectory divergence on small spatial extents (inception aux
    tower: n=B·5·5), so training-dynamics parity vs torch
    (tests/test_train_dynamics_parity.py) pins it here. Normalization itself
    uses the biased variance, same as torch. Variable layout matches
    nn.BatchNorm ('scale'/'bias' params, 'mean'/'var' in batch_stats) so
    checkpoints and weight porting are unchanged. Stats are computed in f32
    regardless of compute dtype (same as flax)."""
    momentum: float = 0.1  # torch-style: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            if self.dtype == jnp.float32:
                # two-pass variance like torch — E[x²]−E[x]² loses ~10 bits
                # when mean²≫var, visible as 1e-3-level gradient noise on BN
                # params vs a float64 reference (the dynamics-parity tests
                # pin this). Costs an extra dependent reduction pass.
                var = jnp.mean(jnp.square(xf - mean), axis=axes)
            else:
                # bf16 compute: inputs carry 8 mantissa bits, so two-pass
                # precision buys nothing — use the one-pass form whose two
                # reductions XLA fuses into a single read of the conv
                # output (two-pass measured 2.5x slower end-to-end on TPU:
                # 747 vs 1,879 img/s inception@299 b128)
                # clamp: f32 cancellation on a large-mean near-constant
                # channel (mean² ≫ var) can make E[x²]−E[x]² slightly
                # NEGATIVE, and rsqrt(var+eps) would then NaN the whole
                # step. The two-pass branch above can't go negative.
                var = jnp.maximum(
                    jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean),
                    0.0)
            if not self.is_initializing():
                n = x.size // c
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + \
                    m * var * (n / max(n - 1, 1))
        # folded multiplier, torch-style: invstd = rsqrt(var+eps), then one
        # fused multiply-add over the tensor
        mul = lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * mul + bias
        return y.astype(self.dtype)


class BatchNormT(nn.Module):
    """torch.nn.BatchNorm2d defaults: eps=1e-5, momentum 0.1. Running stats
    in the 'batch_stats' collection; scale/bias params in f32 regardless of
    compute dtype."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return TorchBN(momentum=0.1, epsilon=1e-5, dtype=self.dtype,
                       name="bn")(x, use_running_average=not train)


def max_pool(x, window, stride, padding=0):
    """torch MaxPool2d: symmetric padding with -inf fill.

    reduce_window is the fast form on TPU: a strided-slice + elementwise-max
    rewrite (to dodge SelectAndScatter in the gradient) measured 6x SLOWER
    end-to-end (753 vs 1,880 img/s inception@299 b128) because stride-2
    slices force vector relayouts — see tools/bench_stem.py --layers.
    Keeping this forward and swapping ONLY the VJP (k^2 shifted
    equality-mask terms, no scatter) was also measured-rejected: the
    dilation/stride slices in the backward lose 1.6-3x to SelectAndScatter
    on every inception pool shape (tools/bench_pool_probe.py, round 3)."""
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
