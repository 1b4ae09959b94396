"""int8-RESIDENT inference graph for the resnet families (RUN int8 tier).

Same motivation as the flagship's resident graph (models/quant_graph.py):
the generic interceptor quantization (models/quant.py) materializes every
activation twice — the conv's dequantized bf16 output AND the next conv's
re-quantized s8 copy. On resnet50 the per-op profile
(tools/profile_ops.py --model resnet50 --precision int8, b256) shows it is
even worse than inception: the residual topology forces DUAL-output
fusions (s8 + bf16 twins of the huge 56²×256 stage-1 tensors) plus
standalone requantize passes — together ~40% of the 16.1 ms step.

This module re-expresses the SAME quantization dataflow-resident:

  * every post-relu tensor lives in HBM as int8 exactly once; the
    dequantize→bias→relu→requantize chain rides each conv's epilogue;
  * the residual add consumes the s8 shortcut directly (dequantize inline
    in the add fusion) and the pre-add conv output never gets an s8 twin
    (it is consumed once, by the add);
  * the stem is quantized BEFORE its maxpool at the post-maxpool scale:
    max-pooling non-negative values with full window coverage preserves
    the maximum, so pre- and post-pool absmax are equal and s8 maxpool is
    exact (max commutes with monotonic quantization);
  * scales travel as Python floats at trace time (zero runtime cost).

Quantization points are the interceptor's (every conv input's per-tensor
absmax '<conv path>:in', per-channel int8 weights, fc head full
precision) with ONE deliberate difference: the residual shortcut adds
the s8 block input (dequantized inline) where the interceptor adds the
full bf16 tensor — that IS the byte win (no bf16 twin of every block
output), and it costs up to half an LSB of the block-input scale per
shortcut. Measured on random-weight nets @64² (worst-case-ish):
resnet18 max |Δp| vs fp32 3.9e-3 (interceptor: 4.6e-3 — resident is
*closer*), resnet50 1.8e-2 vs interceptor's 1.1e-2; argmax identical to
both fp32 and the interceptor everywhere
(tests/test_quant.py::TestResidentGraph::test_resident_resnet_*).

Reference workload: RUN's per-bin forward (/root/reference/
neuston_net.py:233-271) on the resnet* families (neuston_models.py:37-39).
Parameters come from the BN-folded tree (models/fold.py). Enable/disable:
IFCBNN_QUANT_RESIDENT=0 falls back to the interceptor (A/B lever)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .quant import _tree_get
from .quant_resident import (_DN, _norm, _q8, CalibCtxBase, QuantCtxBase,
                             make_entrypoints)
from .resnet import RESNET_CFGS


def _block_list(variant):
    block_kind, stage_sizes = RESNET_CFGS[variant]
    expansion = 1 if block_kind == "basic" else 4
    blocks, in_planes = [], 64
    for stage, n_blocks in enumerate(stage_sizes):
        planes = 64 * (2 ** stage)
        for i in range(n_blocks):
            stride = 2 if (stage > 0 and i == 0) else 1
            needs_ds = (stride != 1) or (in_planes != planes * expansion)
            blocks.append((f"layer{stage + 1}_{i}", stride, needs_ds))
            in_planes = planes * expansion
    return block_kind, blocks


class _CalibCtx(CalibCtxBase):
    """Float forward over the folded params recording every conv input's
    absmax ('<path>:in') + geometry (same contract as quant.make_calib_fn:
    the keys and geoms feed quantize_params / the quant pass)."""

    def conv(self, x, path, stride=1, padding=0, relu=True):
        strides, pads = _norm(stride, padding)
        self.geoms[tuple(path)] = dict(strides=strides, padding=pads)
        self._rec("/".join(path) + ":in", x)
        node = _tree_get(self.p, path)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), node["kernel"].astype(self.dtype),
            strides, pads, dimension_numbers=_DN,
            preferred_element_type=self.dtype)
        y = y + node["bias"].astype(self.dtype)
        return jnp.maximum(y, 0) if relu else y

    def maxpool(self, x):
        from .layers import max_pool
        return max_pool(x, 3, 2, 1)

    def add_relu(self, out, identity):
        return jnp.maximum(out + identity, 0)


class _QuantCtx(QuantCtxBase):
    """int8-resident forward: post-relu activations are (int8, python-float
    scale) pairs; `pruned` carries the fc head, `qconv` the int8
    weights/scales/biases from quant.quantize_params."""

    def conv(self, x, path, stride=1, padding=0, relu=True):
        strides, pads = _norm(stride, padding)
        key = "/".join(path)
        q = self.qconv[key]
        if isinstance(x, tuple):
            xq, s_x = x
        else:  # float entry: the image at the stem conv
            s_x = self._scale(key + ":in")
            xq = _q8(x.astype(jnp.float32), 1.0 / s_x)
        y = lax.conv_general_dilated(
            xq, q["w_int8"], strides, pads, dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (q["w_scale"] * s_x) + q["bias"]
        if relu:
            y = jnp.maximum(y, 0.0)
        # round to model dtype like the interceptor's dequantize — keeps
        # the two int8 graphs agreeing at the bf16-rounding level (and
        # halves the bytes of any materialized pre-add tensor)
        return y.astype(self.dtype)

    def maxpool(self, x):
        q, s = x
        out = lax.reduce_window(
            q, jnp.array(-128, jnp.int8), lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
        return out, s

    def add_relu(self, out, identity):
        if isinstance(identity, tuple):
            q, s = identity
            identity = (q.astype(jnp.float32) * s).astype(self.dtype)
        return jnp.maximum(out + identity, 0)


def _block(ctx, x, name, stride, needs_ds, kind, emit_key):
    if kind == "basic":
        out = ctx.conv(x, (name, "conv1", "conv"), stride=stride, padding=1)
        out = ctx.emit(out, f"{name}/conv2/conv:in")
        out = ctx.conv(out, (name, "conv2", "conv"), padding=1, relu=False)
    else:
        out = ctx.conv(x, (name, "conv1", "conv"))
        out = ctx.emit(out, f"{name}/conv2/conv:in")
        out = ctx.conv(out, (name, "conv2", "conv"), stride=stride,
                       padding=1)
        out = ctx.emit(out, f"{name}/conv3/conv:in")
        out = ctx.conv(out, (name, "conv3", "conv"), relu=False)
    identity = x
    if needs_ds:
        identity = ctx.conv(x, (name, "ds_conv", "conv"), stride=stride,
                            relu=False)
    y = ctx.add_relu(out, identity)
    return ctx.emit(y, emit_key) if emit_key else y


def _graph(ctx, x, variant):
    kind, blocks = _block_list(variant)
    x = ctx.conv(x.astype(jnp.float32), ("conv1", "conv"), stride=2,
                 padding=3)
    # quantize pre-maxpool at the post-maxpool (= layer1_0/conv1 input)
    # scale — exact, see module docstring
    x = ctx.emit(x, "layer1_0/conv1/conv:in")
    x = ctx.maxpool(x)
    for k, (name, stride, needs_ds) in enumerate(blocks):
        nxt = (blocks[k + 1][0] + "/conv1/conv:in"
               if k + 1 < len(blocks) else None)
        x = _block(ctx, x, name, stride, needs_ds, kind, nxt)
    x = jnp.mean(x, axis=(1, 2))  # final block output is float
    fc = ctx.p["fc"]
    x = x.astype(ctx.dtype) @ fc["kernel"].astype(ctx.dtype) \
        + fc["bias"].astype(ctx.dtype)
    return x.astype(jnp.float32)


make_calib_fn, make_quant_predict = make_entrypoints(
    _CalibCtx, _QuantCtx, _graph, lambda m: (m.variant,))
