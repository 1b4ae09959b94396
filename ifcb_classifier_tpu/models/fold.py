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
torchvision Inception3 parity — neuston_models.py:23-26), resnet*
(convN/bnN + ds_conv/ds_bn pairs, eps=1e-5), vgg*_bn (features_i conv +
features_{i+1} bn, eps=1e-5), and efficientnet_b* ({stem,expand,dw,
project,head}_conv + matching _bn, per-variant eps). DenseNets are
pre-activation (BN→relu→conv — the relu blocks folding); the remaining
families have no BN.
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np

__all__ = ["supports_fold", "fold_params", "fold_conv_bn"]

# ConvT/TorchBN-wrapper sibling naming, per family
_RESNET_PAIRS = {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
                 "ds_conv": "ds_bn"}
_EFFNET_PAIRS = {"stem_conv": "stem_bn", "expand_conv": "expand_bn",
                 "dw_conv": "dw_bn", "project_conv": "project_bn",
                 "head_conv": "head_bn"}


def supports_fold(model_name: str) -> bool:
    return (model_name == "inception_v3"
            or model_name.startswith("resnet")
            or model_name.startswith("efficientnet")
            or (model_name.startswith("vgg")
                and model_name.endswith("_bn")))


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


def _fold_sibling_pairs(params, stats, pairs, eps):
    """ConvT ('conv' wrapper) / TorchBN-wrapper ('bn' wrapper) sibling
    pairs at any nesting depth — resnet's convN/bnN and efficientnet's
    *_conv/*_bn naming."""

    def walk(p, s):
        out = {key: (walk(v, s.get(key, {})) if isinstance(v, Mapping)
                     else v) for key, v in p.items()}
        for ck, bk in pairs.items():
            if (ck in out and bk in out and isinstance(out[ck], Mapping)
                    and "conv" in out[ck] and "bn" in out[bk]):
                conv, bn = out[ck]["conv"], out[bk]["bn"]
                st = s[bk]["bn"]
                k, b = fold_conv_bn(conv["kernel"], conv.get("bias"),
                                    bn["scale"], bn["bias"],
                                    st["mean"], st["var"], eps=eps)
                out[ck] = {"conv": {"kernel": k, "bias": b}}
                del out[bk]
        return out

    return walk(params, stats)


def _fold_vgg(params, stats):
    """vgg*_bn: conv at features_i, its BN at features_{i+1} (torchvision
    Sequential numbering; vgg.py keeps the indices when folding so conv
    param names are unchanged)."""
    out = dict(params)
    for k in sorted(list(out.keys())):
        if not (k.startswith("features_") and isinstance(out.get(k), Mapping)
                and "conv" in out[k]):
            continue
        bk = "features_{}".format(int(k.split("_")[1]) + 1)
        if (bk in out and isinstance(out[bk], Mapping) and "bn" in out[bk]):
            conv, bn = out[k]["conv"], out[bk]["bn"]
            st = stats[bk]["bn"]
            kk, bb = fold_conv_bn(conv["kernel"], conv.get("bias"),
                                  bn["scale"], bn["bias"],
                                  st["mean"], st["var"], eps=1e-5)
            out[k] = {"conv": {"kernel": kk, "bias": bb}}
            del out[bk]
    return out


def fold_params(model_name: str, params, batch_stats):
    """(params, batch_stats) of the standard model → (params', {}) for the
    same family built with fold_bn=True. Host-side numpy; call once at
    engine build, before device_put."""
    if not supports_fold(model_name):
        raise ValueError(f"{model_name!r} does not support BN folding")
    if model_name == "inception_v3":
        return _fold_inception(params, batch_stats), {}
    if model_name.startswith("vgg"):
        return _fold_vgg(params, batch_stats), {}
    if model_name.startswith("efficientnet"):
        from .efficientnet import bn_params_for
        eps, _mom = bn_params_for(model_name)
        return _fold_sibling_pairs(params, batch_stats, _EFFNET_PAIRS,
                                   eps), {}
    return _fold_sibling_pairs(params, batch_stats, _RESNET_PAIRS,
                               eps=1e-5), {}
