"""Eval-time BatchNorm→conv folding for the inference engine.

At eval, BatchNorm is the affine map y = (x − μ)·γ/√(σ²+ε) + β with frozen
running stats — pure per-channel algebra that folds into the preceding
convolution's kernel and bias:

    mul = γ/√(σ²+ε)          kernel' = kernel · mul        (per out-channel)
    bias' = (bias₀ − μ)·mul + β          (bias₀ = 0 for bias-free convs)

The reference never needed this (cuDNN/onnxruntime fold internally on its
deployment path, neuston_onnx.py:44-65); here it is a host-side numpy
transform run ONCE at `InferenceEngine` build, producing a parameter tree
for the `fold_bn=True` variant of the model (conv carries a bias, the BN
module is structurally absent). Folding is exact algebra; float rounding
moves logits by ~1e-6 (f32) — pinned ≤1e-3 by tests/test_fold.py.

Supported: inception_v3 (BasicConv2d conv+bn siblings, eps=1e-3,
torchvision Inception3 parity — neuston_models.py:23-26) and resnet*
(convN/bnN + ds_conv/ds_bn pairs, eps=1e-5). DenseNets are pre-activation
(BN→relu→conv — the relu blocks folding); other families either lack BN or
aren't on the deployment hot path yet.
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np

__all__ = ["supports_fold", "fold_params", "fold_conv_bn"]

# ConvT/BatchNormT sibling naming used by the resnet family (resnet.py)
_RESNET_PAIRS = {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
                 "ds_conv": "ds_bn"}


def supports_fold(model_name: str) -> bool:
    return model_name == "inception_v3" or model_name.startswith("resnet")


def fold_conv_bn(kernel, conv_bias, bn_scale, bn_bias, mean, var, eps):
    """Fold one BN (γ=bn_scale, β=bn_bias, running μ/σ²) into the preceding
    conv. Math in float64 so the fold adds no rounding beyond the final f32
    cast. Returns (kernel', bias') as float32."""
    mul = np.asarray(bn_scale, np.float64) / np.sqrt(
        np.asarray(var, np.float64) + eps)
    k = np.asarray(kernel, np.float64) * mul  # [H,W,I,O] · [O]
    b0 = 0.0 if conv_bias is None else np.asarray(conv_bias, np.float64)
    b = (b0 - np.asarray(mean, np.float64)) * mul + np.asarray(
        bn_bias, np.float64)
    return k.astype(np.float32), b.astype(np.float32)


def _fold_inception(params, stats):
    """BasicConv2d scopes are exactly {'conv': {kernel}, 'bn': {scale,bias}}
    (inception.py:25-40, TorchBN eps=0.001)."""

    def walk(p, s):
        if ("conv" in p and "bn" in p and isinstance(p["conv"], Mapping)
                and "kernel" in p["conv"]):
            k, b = fold_conv_bn(
                p["conv"]["kernel"], p["conv"].get("bias"),
                p["bn"]["scale"], p["bn"]["bias"],
                s["bn"]["mean"], s["bn"]["var"], eps=1e-3)
            out = {"conv": {"kernel": k, "bias": b}}
            for key, v in p.items():
                if key not in ("conv", "bn"):
                    out[key] = walk(v, s.get(key, {})) \
                        if isinstance(v, Mapping) else v
            return out
        return {key: (walk(v, s.get(key, {})) if isinstance(v, Mapping)
                      else v) for key, v in p.items()}

    return walk(params, stats)


def _fold_resnet(params, stats):
    """ConvT ('conv' wrapper) / BatchNormT ('bn' wrapper) sibling pairs
    (resnet.py, BatchNormT eps=1e-5)."""

    def walk(p, s):
        out = {key: (walk(v, s.get(key, {})) if isinstance(v, Mapping)
                     else v) for key, v in p.items()}
        for ck, bk in _RESNET_PAIRS.items():
            if (ck in out and bk in out and isinstance(out[ck], Mapping)
                    and "conv" in out[ck] and "bn" in out[bk]):
                conv, bn = out[ck]["conv"], out[bk]["bn"]
                st = s[bk]["bn"]
                k, b = fold_conv_bn(conv["kernel"], conv.get("bias"),
                                    bn["scale"], bn["bias"],
                                    st["mean"], st["var"], eps=1e-5)
                out[ck] = {"conv": {"kernel": k, "bias": b}}
                del out[bk]
        return out

    return walk(params, stats)


def fold_params(model_name: str, params, batch_stats):
    """(params, batch_stats) of the standard model → (params', {}) for the
    same family built with fold_bn=True. Host-side numpy; call once at
    engine build, before device_put."""
    if not supports_fold(model_name):
        raise ValueError(f"{model_name!r} does not support BN folding")
    if model_name == "inception_v3":
        return _fold_inception(params, batch_stats), {}
    return _fold_resnet(params, batch_stats), {}
