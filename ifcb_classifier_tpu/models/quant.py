"""Opt-in int8 post-training quantization for the inference path.

No reference analog (the reference infers fp32 eager torch,
/root/reference/neuston_models.py:152-157) — this is a TPU-native
*beyond-parity* speed tier: the v5e MXU runs int8 at 2x its bf16 rate
(394 vs 197 TOPS), and the measured per-conv speedup on inception's fat
layers is 1.6-1.7x (BASELINE.md round-3 table). `RUN --precision int8`
opts in; scores shift at the ~1e-2 probability level vs bf16 (gate your
use case accordingly — the .h5 result files already quantize scores to
f16, and argmax agreement is pinned by tests/test_quant.py).

Scheme (standard symmetric PTQ):
  * weights: per-output-channel int8, s_w[co] = absmax(w[..., co]) / 127,
    computed once at engine build from the BN-FOLDED conv weights
  * activations: per-tensor int8 with scales calibrated from real data
    (one jitted capture pass over the first batch the engine sees —
    absmax of every conv input)
  * conv in int8 with int32 accumulation (hits the MXU int8 path), then
    dequantize + bias in f32, rest of the net unchanged (bf16); the
    classifier head Dense stays full precision (protects logits and the
    head-TP sharding)

Implementation is a flax METHOD INTERCEPTOR (nn.intercept_methods), so no
model definition changes: every `nn.Conv.__call__` on the folded graph is
swapped for quantize->int8 conv->dequantize at trace time. Activation
scales embed as Python-float CONSTANTS in the traced graph — convs that
share an input (inception branches) produce byte-identical quantize
subgraphs, which XLA CSEs into one int8 tensor.

Depthwise/grouped convs are skipped (VPU, not MXU — no int8 win), which
is why efficientnet is excluded from supports_quant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fold import supports_fold

_QUANT_KEY = "__quant__"

# families whose folded graphs are plain nn.Conv stacks (no grouped convs
# on the hot path); quant builds on fold, so this is a subset of fold
_QUANT_FAMILIES = ("inception_v3", "resnet18", "resnet34", "resnet50",
                   "resnet101", "resnet152", "vgg11_bn", "vgg13_bn",
                   "vgg16_bn", "vgg19_bn")
# densenet exclusion is MEASURED (tools/bench_quant_probe.py): the
# per-layer BN->relu->conv pattern at densenet121's dominant shapes is
# 1.05x weighted int8-resident vs bf16, with the most frequent class
# (blk3 1x1 640->128 @14², x24) 0.82x — narrow-output 1x1s don't pay for
# their quantize passes. (It cannot BN-fold anyway: BN precedes each conv
# behind a relu, so int8 would also carry the BN elementwise prologue.)
# efficientnet exclusion is MEASURED, not just reasoned: quantizing its
# non-grouped (1x1) convs via the interceptor clocked 11.33 vs 10.64
# ms/step bf16-folded (b0, b256 — 6.5% SLOWER): the quantize/dequantize
# passes around each 1x1 cost more than the int8 MXU saves, and the
# depthwise convs (VPU) gain nothing by construction.


def supports_quant(model_name: str) -> bool:
    return model_name in _QUANT_FAMILIES and supports_fold(model_name)


# Measured A/B (tools/roofline.py --precision int8, b256): skipping the
# lane-starved stem convs (H>64, C_in<128 — where the int8 MXU path is
# ~1.0x bf16) made the step WORSE: 27.97 vs 27.53 ms, 14.47 vs 13.91
# GB/step. The stem's quantize passes cost less than the bf16 activations
# they avoid (s8 halves the biggest tensors in the net), so every
# non-grouped conv quantizes, stem included.


def _tree_get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _tree_prune(tree, path):
    """Return a copy of `tree` with the subtree at `path` removed."""
    if len(path) == 1:
        return {k: v for k, v in tree.items() if k != path[0]}
    return {k: (_tree_prune(v, path[1:]) if k == path[0] else v)
            for k, v in tree.items()}


def _residency_module(model):
    """Families with a hand-built int8-RESIDENT graph: activations stay s8
    in HBM between convs instead of materializing both a bf16 and an s8
    copy per edge (inception: models/quant_graph.py; resnets:
    models/quant_resnet.py; vgg*_bn: models/quant_vgg.py). Same
    quantization points and scales as the interceptor graph (proof
    sketches in the module docstrings; resnets deviate on the shortcut,
    documented there); returns the graph module or None (→ generic
    interceptor). IFCBNN_QUANT_RESIDENT=0 falls back for A/B."""
    import os
    if (not getattr(model, "fold", False)
            or os.environ.get("IFCBNN_QUANT_RESIDENT", "1") == "0"):
        return None
    from .inception import InceptionV3
    from .resnet import ResNet
    from .vgg import VGG
    if isinstance(model, InceptionV3):
        from . import quant_graph
        return quant_graph
    if isinstance(model, ResNet):
        from . import quant_resnet
        return quant_resnet
    if isinstance(model, VGG):
        from . import quant_vgg
        return quant_vgg
    return None


def make_calib_fn(model):
    """Build a jit-able (params, batch_stats, images) -> {path: absmax}
    capture pass over the FOLDED eval graph: the per-tensor input absmax of
    every quantizable conv, plus the conv geometry needed to quantize."""
    resident = _residency_module(model)
    if resident is not None:
        return resident.make_calib_fn(model)
    import flax.linen as nn

    geoms = {}

    def calib_fn(params, batch_stats, images):
        records = {}

        def interceptor(next_fun, args, kwargs, context):
            m = context.module
            if (isinstance(m, nn.Conv)
                    and context.method_name == "__call__"
                    and m.feature_group_count == 1):
                records[m.path] = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                geoms[m.path] = dict(strides=m.strides, padding=m.padding)
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply({"params": params, "batch_stats": batch_stats},
                        images, train=False)
        return records

    return calib_fn, geoms


def quantize_params(params, geoms):
    """Split a folded param tree into (pruned_params, qconv).

    qconv[path] = {w_int8 [kh,kw,ci,co], w_scale f32[co], bias f32[co]};
    the corresponding conv kernels/biases are REMOVED from pruned_params
    (the interceptor never looks them up, and shipping both would double
    weight traffic). Weight scales are per-output-channel absmax/127;
    activation scales (the calibration absmax) live in the predict fn,
    not here.
    """
    params = jax.device_get(params)
    qconv = {}
    pruned = params
    for path in sorted(geoms):
        conv = _tree_get(params, path)
        w = np.asarray(conv["kernel"], np.float32)
        w_scale = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
        w_int8 = np.clip(np.rint(w / w_scale), -127, 127).astype(np.int8)
        bias = np.asarray(conv.get("bias", np.zeros(w.shape[-1])), np.float32)
        qconv["/".join(path)] = dict(w_int8=w_int8,
                                     w_scale=w_scale.astype(np.float32),
                                     bias=bias)
        pruned = _tree_prune(pruned, path)
    return pruned, qconv


def build_quant_predict(model, params, batch_stats, calib_images):
    """One-shot offline build: calibrate activation scales on ONE batch,
    quantize the folded weights, and return (device_params, predict_fn)
    where device_params carries the int8 leaves under '__quant__'.

    This is the single source of truth for the calibrate→quantize→swap
    sequence the engine performs lazily (infer/runner.py:_calibrate) —
    bench.py / tools/roofline.py / tools/profile_ops.py all build their
    quantized graphs through here so they measure the production graph.
    """
    calib_fn, geoms = make_calib_fn(model)
    absmax = {k: float(v) for k, v in jax.device_get(
        jax.jit(calib_fn)(params, batch_stats, calib_images)).items()}
    # quantize_params device_gets internally — no second fetch here
    pruned, qconv = quantize_params(params, geoms)
    pruned[_QUANT_KEY] = qconv
    return jax.device_put(pruned), make_quant_predict(model, absmax, geoms)


def make_quant_predict(model, absmax, geoms):
    """Build predict(params_with_qconv, batch_stats, images) -> probs where
    every calibrated conv runs int8 on the MXU. `params_with_qconv` is the
    pruned param tree carrying the qconv leaves under params['__quant__']
    (keeps the engine's (params, batch_stats, canvas, sizes) call signature
    and the existing sharding rules — qconv leaves replicate).
    """
    resident = _residency_module(model)
    if resident is not None:
        return resident.make_quant_predict(model, absmax, geoms)
    import flax.linen as nn

    # python-float constants -> identical quantize subgraphs for convs
    # sharing an input -> XLA CSE leaves ONE int8 copy per tensor
    x_scales = {p: max(float(v), 1e-12) / 127.0 for p, v in absmax.items()}

    def predict(params, batch_stats, images):
        params = dict(params)
        qconv = params.pop(_QUANT_KEY)

        def interceptor(next_fun, args, kwargs, context):
            m = context.module
            if (not isinstance(m, nn.Conv)
                    or context.method_name != "__call__"
                    or m.path not in x_scales):
                return next_fun(*args, **kwargs)
            q = qconv["/".join(m.path)]
            s_x = x_scales[m.path]
            g = geoms[m.path]
            x = args[0].astype(jnp.float32)
            xq = jnp.clip(jnp.round(x * (1.0 / s_x)), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, q["w_int8"], window_strides=g["strides"],
                padding=g["padding"],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = (y.astype(jnp.float32) * (q["w_scale"] * s_x) + q["bias"])
            return y.astype(args[0].dtype)

        with nn.intercept_methods(interceptor):
            outputs = model.apply({"params": params,
                                   "batch_stats": batch_stats},
                                  images, train=False)
        if isinstance(outputs, tuple):
            outputs = outputs[0]
        return jax.nn.softmax(outputs.astype(jnp.float32), axis=-1)

    return predict
