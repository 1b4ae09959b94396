"""Inception-v3 with auxiliary head in Flax NHWC — the reference's default
backbone and the flagship of this framework.

Parity contract with the reference (/root/reference/neuston_models.py:23-26,
70-78): in training mode the model returns a (logits, aux_logits) tuple and
the loss combines them as `loss1 + 0.4*loss2`; in eval mode it returns logits
only. Head surgery replaces both `fc` and `AuxLogits.fc`. `transform_input`
mirrors torchvision's pretrained-mode channel renormalization.

Structure follows the torchvision Inception3 graph (Conv2d_1a..Mixed_7c,
BasicConv2d = conv(bias=False)+BN(eps=0.001)+relu).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import TorchBN, avg_pool, global_avg_pool, max_pool


def transform_input_renorm(x):
    """torchvision pretrained-mode channel renormalization (Inception3
    transform_input): maps inputs normalized to mean/std 0.5 onto the
    ImageNet per-channel statistics. Shared by the flax model below and
    the int8-resident graph (models/quant_graph.py) so the constants
    cannot drift between the two."""
    ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
    ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
    ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
    return jnp.concatenate([ch0, ch1, ch2], axis=-1)


class BasicConv2d(nn.Module):
    features: int
    kernel_size: tuple
    stride: int = 1
    padding: tuple = (0, 0)
    dtype: Any = jnp.float32
    fold: bool = False  # eval-only: BN pre-folded into conv kernel/bias
    # (models/fold.py) — conv carries a bias, the BN op is absent

    @nn.compact
    def __call__(self, x, train: bool):
        p = self.padding
        x = nn.Conv(self.features, self.kernel_size, strides=(self.stride,) * 2,
                    padding=((p[0], p[0]), (p[1], p[1])), use_bias=self.fold,
                    dtype=self.dtype, name="conv")(x)
        if not self.fold:
            x = TorchBN(momentum=0.1, epsilon=0.001, dtype=self.dtype,
                        name="bn")(x, use_running_average=not train)
        return nn.relu(x)


def _bc(features, k, stride=1, padding=(0, 0), dtype=jnp.float32, name=None,
        fold=False):
    if isinstance(k, int):
        k = (k, k)
    if isinstance(padding, int):
        padding = (padding, padding)
    return BasicConv2d(features, k, stride, padding, dtype, fold, name=name)


class SpaceToDepthStemConv(nn.Module):
    """Conv2d_1a_3x3 (3x3, stride 2, VALID, 3→32) computed as a stride-1 2x2
    conv over a 2x2 space-to-depth rearrangement of the input.

    TPU-shaped: a stride-2 conv with C_in=3 occupies 27 of the MXU's 128-lane
    contraction dim and forces XLA into a strided window; the s2d form is an
    unstrided conv with contraction 2·2·12=48 over a 4x smaller spatial grid
    (the standard TPU ResNet stem trick). Numerically EXACT: the logical
    parameter stays the torch-layout [3,3,3,32] kernel ('conv/kernel', so
    checkpoints and weight porting are unchanged); it is rearranged into the
    equivalent [2,2,12,32] kernel at apply time (zero taps where 2a+p=3).
    Gradients flow through the rearrangement, so training is identical too.
    """
    features: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, C, self.features),
            jnp.float32)  # same logical param as nn.Conv(3x3)
        # pad H,W to even; the padded row/col is only touched by zero taps
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        Hp, Wp = x.shape[1], x.shape[2]
        x = x.reshape(B, Hp // 2, 2, Wp // 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp // 2, Wp // 2, 4 * C)
        # kernel [di,dj,c,o] → [(a,p),(b,q),c,o] → [a,b,(p,q,c),o]
        k4 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # [4,4,C,o]
        k4 = k4.reshape(2, 2, 2, 2, C, self.features)           # [a,p,b,q,c,o]
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * C, self.features)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), k4.astype(self.dtype),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)


class BasicConv2dS2D(nn.Module):
    """BasicConv2d with the space-to-depth conv; module/param names identical
    to BasicConv2d('Conv2d_1a_3x3') so checkpoints are interchangeable."""
    features: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = SpaceToDepthStemConv(self.features, self.dtype, name="conv")(x)
        x = TorchBN(momentum=0.1, epsilon=0.001, dtype=self.dtype,
                    name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32
    fold: bool = False

    @nn.compact
    def __call__(self, x, train):
        d, f = self.dtype, self.fold
        b1 = _bc(64, 1, dtype=d, fold=f, name="branch1x1")(x, train)
        b5 = _bc(48, 1, dtype=d, fold=f, name="branch5x5_1")(x, train)
        b5 = _bc(64, 5, padding=2, dtype=d, fold=f, name="branch5x5_2")(b5, train)
        b3 = _bc(64, 1, dtype=d, fold=f, name="branch3x3dbl_1")(x, train)
        b3 = _bc(96, 3, padding=1, dtype=d, fold=f, name="branch3x3dbl_2")(b3, train)
        b3 = _bc(96, 3, padding=1, dtype=d, fold=f, name="branch3x3dbl_3")(b3, train)
        bp = avg_pool(x, 3, 1, 1)
        bp = _bc(self.pool_features, 1, dtype=d, fold=f, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32
    fold: bool = False

    @nn.compact
    def __call__(self, x, train):
        d, f = self.dtype, self.fold
        b3 = _bc(384, 3, stride=2, dtype=d, fold=f, name="branch3x3")(x, train)
        bd = _bc(64, 1, dtype=d, fold=f, name="branch3x3dbl_1")(x, train)
        bd = _bc(96, 3, padding=1, dtype=d, fold=f, name="branch3x3dbl_2")(bd, train)
        bd = _bc(96, 3, stride=2, dtype=d, fold=f, name="branch3x3dbl_3")(bd, train)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32
    fold: bool = False

    @nn.compact
    def __call__(self, x, train):
        d, c7, f = self.dtype, self.channels_7x7, self.fold
        b1 = _bc(192, 1, dtype=d, fold=f, name="branch1x1")(x, train)
        b7 = _bc(c7, 1, dtype=d, fold=f, name="branch7x7_1")(x, train)
        b7 = _bc(c7, (1, 7), padding=(0, 3), dtype=d, fold=f, name="branch7x7_2")(b7, train)
        b7 = _bc(192, (7, 1), padding=(3, 0), dtype=d, fold=f, name="branch7x7_3")(b7, train)
        bd = _bc(c7, 1, dtype=d, fold=f, name="branch7x7dbl_1")(x, train)
        bd = _bc(c7, (7, 1), padding=(3, 0), dtype=d, fold=f, name="branch7x7dbl_2")(bd, train)
        bd = _bc(c7, (1, 7), padding=(0, 3), dtype=d, fold=f, name="branch7x7dbl_3")(bd, train)
        bd = _bc(c7, (7, 1), padding=(3, 0), dtype=d, fold=f, name="branch7x7dbl_4")(bd, train)
        bd = _bc(192, (1, 7), padding=(0, 3), dtype=d, fold=f, name="branch7x7dbl_5")(bd, train)
        bp = avg_pool(x, 3, 1, 1)
        bp = _bc(192, 1, dtype=d, fold=f, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32
    fold: bool = False

    @nn.compact
    def __call__(self, x, train):
        d, f = self.dtype, self.fold
        b3 = _bc(192, 1, dtype=d, fold=f, name="branch3x3_1")(x, train)
        b3 = _bc(320, 3, stride=2, dtype=d, fold=f, name="branch3x3_2")(b3, train)
        b7 = _bc(192, 1, dtype=d, fold=f, name="branch7x7x3_1")(x, train)
        b7 = _bc(192, (1, 7), padding=(0, 3), dtype=d, fold=f, name="branch7x7x3_2")(b7, train)
        b7 = _bc(192, (7, 1), padding=(3, 0), dtype=d, fold=f, name="branch7x7x3_3")(b7, train)
        b7 = _bc(192, 3, stride=2, dtype=d, fold=f, name="branch7x7x3_4")(b7, train)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32
    fold: bool = False

    @nn.compact
    def __call__(self, x, train):
        d, f = self.dtype, self.fold
        b1 = _bc(320, 1, dtype=d, fold=f, name="branch1x1")(x, train)
        b3 = _bc(384, 1, dtype=d, fold=f, name="branch3x3_1")(x, train)
        b3a = _bc(384, (1, 3), padding=(0, 1), dtype=d, fold=f, name="branch3x3_2a")(b3, train)
        b3b = _bc(384, (3, 1), padding=(1, 0), dtype=d, fold=f, name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = _bc(448, 1, dtype=d, fold=f, name="branch3x3dbl_1")(x, train)
        bd = _bc(384, 3, padding=1, dtype=d, fold=f, name="branch3x3dbl_2")(bd, train)
        bda = _bc(384, (1, 3), padding=(0, 1), dtype=d, fold=f, name="branch3x3dbl_3a")(bd, train)
        bdb = _bc(384, (3, 1), padding=(1, 0), dtype=d, fold=f, name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = avg_pool(x, 3, 1, 1)
        bp = _bc(192, 1, dtype=d, fold=f, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionAux(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32
    fold: bool = False

    @nn.compact
    def __call__(self, x, train):
        x = avg_pool(x, 5, 3)
        x = _bc(128, 1, dtype=self.dtype, fold=self.fold, name="conv0")(x, train)
        x = _bc(768, 5, dtype=self.dtype, fold=self.fold, name="conv1")(x, train)
        x = global_avg_pool(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


class InceptionV3(nn.Module):
    num_classes: int = 1000
    aux_logits: bool = True
    transform_input: bool = False
    dropout_rate: float = 0.5  # torchvision Inception3 `dropout` knob
    stem_s2d: bool = False  # space-to-depth first conv (exact, TPU-shaped)
    dtype: Any = jnp.float32
    fold: bool = False  # BN folded into convs (eval-only; models/fold.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, f = self.dtype, self.fold
        if f and train:
            raise ValueError("fold_bn model is eval-only (BN is folded "
                             "into conv weights with frozen stats)")
        if f and self.stem_s2d:
            raise ValueError("fold_bn + stem_s2d unsupported")
        x = x.astype(d)
        if self.transform_input:
            x = transform_input_renorm(x)

        if self.stem_s2d:
            x = BasicConv2dS2D(32, d, name="Conv2d_1a_3x3")(x, train)
        else:
            x = _bc(32, 3, stride=2, dtype=d, fold=f, name="Conv2d_1a_3x3")(x, train)
        x = _bc(32, 3, dtype=d, fold=f, name="Conv2d_2a_3x3")(x, train)
        x = _bc(64, 3, padding=1, dtype=d, fold=f, name="Conv2d_2b_3x3")(x, train)
        x = max_pool(x, 3, 2)
        x = _bc(80, 1, dtype=d, fold=f, name="Conv2d_3b_1x1")(x, train)
        x = _bc(192, 3, dtype=d, fold=f, name="Conv2d_4a_3x3")(x, train)
        x = max_pool(x, 3, 2)
        x = InceptionA(32, d, fold=f, name="Mixed_5b")(x, train)
        x = InceptionA(64, d, fold=f, name="Mixed_5c")(x, train)
        x = InceptionA(64, d, fold=f, name="Mixed_5d")(x, train)
        x = InceptionB(d, fold=f, name="Mixed_6a")(x, train)
        x = InceptionC(128, d, fold=f, name="Mixed_6b")(x, train)
        x = InceptionC(160, d, fold=f, name="Mixed_6c")(x, train)
        x = InceptionC(160, d, fold=f, name="Mixed_6d")(x, train)
        x = InceptionC(192, d, fold=f, name="Mixed_6e")(x, train)

        aux = None
        if self.aux_logits and train:
            # the aux tower (avgpool5/3 → conv5 VALID) only has positive
            # spatial extent when Mixed_6e is ≥17×17, i.e. input ≥299×299 —
            # smaller inputs silently reduce over zero elements (NaN). The
            # reference's input-size rule pins inception to 299
            # (neuston_data.py:344); enforce it loudly.
            if x.shape[1] < 17 or x.shape[2] < 17:
                raise ValueError(
                    "inception_v3 training with aux head requires 299x299 "
                    f"inputs (Mixed_6e got {x.shape[1]}x{x.shape[2]}, "
                    "needs >=17x17)")
            aux = InceptionAux(self.num_classes, d, fold=f, name="AuxLogits")(x, train)

        x = InceptionD(d, fold=f, name="Mixed_7a")(x, train)
        x = InceptionE(d, fold=f, name="Mixed_7b")(x, train)
        x = InceptionE(d, fold=f, name="Mixed_7c")(x, train)
        x = global_avg_pool(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=d, name="fc")(x)
        x = x.astype(jnp.float32)

        if aux is not None:
            # training-mode tuple output; loss = main + 0.4*aux
            # (neuston_models.py:70-78)
            return x, aux.astype(jnp.float32)
        return x
