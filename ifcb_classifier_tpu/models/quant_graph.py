"""int8-RESIDENT inference graph for inception_v3 (the flagship RUN tier).

Why this exists: the generic interceptor quantization (models/quant.py)
materializes every activation twice — each conv's dequantized bf16 output
AND the next conv's re-quantized s8 input. The per-op profile of that graph
(tools/profile_ops.py --precision int8, b256) shows ~8 ms of the 26.4 ms
step is standalone bf16→s8 `clamp_convert` fusions, i.e. pure HBM traffic
for tensors that already exist in another dtype. This module re-expresses
the SAME quantization as a producer-side dataflow: every activation lives
in HBM as int8 exactly once, the dequantize→bias→relu→requantize chain
rides each convolution's epilogue fusion, and scales travel as Python
floats at trace time (zero runtime cost).

The quantization points and scales are mathematically the interceptor's:

  * relu commutes with symmetric scaling, so quantizing post-relu at the
    producer equals the consumer-side quantize of the same tensor;
  * all conv consumers of one tensor calibrate the same absmax, so the
    per-tensor producer scale is well defined;
  * a concat's consumer absmax equals the max over its parts' absmaxes, so
    emitting every part at the shared group scale reproduces the
    interceptor's post-concat quantize (maxpool pass-through parts are
    bounded by the block input's absmax, included in the group max).

Only two edges differ, both strictly benign: maxpool outputs reuse their
input's scale (an upper bound — no clipping, ≤1 ulp extra rounding), and
avg-pool branches dequantize to float for the pooled reduce (exactly what
the interceptor graph did). Argmax agreement and score deltas vs the fp32
engine are pinned by tests/test_quant.py.

Reference workload this accelerates: RUN's per-bin forward
(/root/reference/neuston_net.py:233-271, neuston_models.py:152-157 — fp32
eager torch there). Structure mirrors models/inception.py (torchvision
Inception3, eval mode: no aux head, dropout identity); parameters come from
the BN-folded tree (models/fold.py) so the param paths here are the folded
checkpoint's. Enable/disable: IFCBNN_QUANT_RESIDENT=0 falls back to the
interceptor graph (A/B lever)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .inception import transform_input_renorm
from .layers import avg_pool as _avg_pool_f32
from .layers import max_pool as _max_pool_f32
from .quant import _tree_get
from .quant_resident import (_DN, _norm, _q8, CalibCtxBase, QuantCtxBase,
                             make_entrypoints)


class _CalibCtx(CalibCtxBase):
    """Float forward over the folded params, recording per-edge absmax:
    '<conv path>:in' (the tensor arriving at a conv while still float in
    the quantized graph — the image and avg-pooled branches) and
    '<conv path>:out' (the conv's post-relu output, the producer-side
    quantization scale). Also fills `geoms` so quantize_params knows the
    conv set (same contract as quant.make_calib_fn)."""

    def conv(self, x, path, stride=1, padding=0, emit="self"):
        strides, pads = _norm(stride, padding)
        self.geoms[tuple(path)] = dict(strides=strides, padding=pads)
        key = "/".join(path)
        self._rec(key + ":in", x)
        node = _tree_get(self.p, path)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), node["kernel"].astype(self.dtype),
            strides, pads, dimension_numbers=_DN,
            preferred_element_type=self.dtype)
        y = jnp.maximum(y + node["bias"].astype(self.dtype), 0)
        self._rec(key + ":out", y)
        return y

    def group(self, out_keys, extra=()):
        return None  # scales exist only in the quantized pass

    def concat(self, parts, sig):
        return jnp.concatenate(parts, axis=-1)

    def max_pool(self, x, window, stride):
        return _max_pool_f32(x, window, stride)

    def avg_pool_f(self, x, window, stride, padding):
        return _avg_pool_f32(x, window, stride, padding)

    def requant(self, x, sig):
        return x


class _QuantCtx(QuantCtxBase):
    """Activations are (int8 array, python-float scale) pairs between
    convs; inception's concat groups share one emission scale (group()
    below), which is why conv() takes an explicit `emit` argument instead
    of the base emit(key) helper."""

    def conv(self, x, path, stride=1, padding=0, emit="self"):
        strides, pads = _norm(stride, padding)
        key = "/".join(path)
        q = self.qconv[key]
        if isinstance(x, tuple):
            xq, s_x = x
        else:  # float entry (image, avg-pooled branch)
            s_x = self._scale(key + ":in")
            xq = _q8(x.astype(jnp.float32), 1.0 / s_x)
        y = lax.conv_general_dilated(
            xq, q["w_int8"], strides, pads, dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
        y = jnp.maximum(y.astype(jnp.float32) * (q["w_scale"] * s_x)
                        + q["bias"], 0.0)
        if emit is None:
            return y.astype(self.dtype)
        s_out = self._scale(key + ":out") if emit == "self" else emit
        return _q8(y, 1.0 / s_out), s_out

    def group(self, out_keys, extra=()):
        """Shared emission scale of a concat domain: max over the member
        convs' output absmaxes and any pass-through parts' scales."""
        hi = max(float(self.absmax[k]) for k in out_keys)
        for part in extra:
            hi = max(hi, part[1] * 127.0)
        return max(hi, 1e-12) / 127.0

    def concat(self, parts, sig):
        return jnp.concatenate([p[0] for p in parts], axis=-1), sig

    def max_pool(self, x, window, stride):
        q, s = x
        out = lax.reduce_window(
            q, jnp.array(-128, jnp.int8), lax.max,
            (1, window, window, 1), (1, stride, stride, 1),
            ((0, 0), (0, 0), (0, 0), (0, 0)))
        return out, s

    def avg_pool_f(self, x, window, stride, padding):
        q, s = x
        xf = (q.astype(jnp.float32) * s).astype(self.dtype)
        return _avg_pool_f32(xf, window, stride, padding)

    def requant(self, x, sig):
        q, s = x
        if abs(s - sig) < 1e-30:
            return q, sig
        # sig >= s by group() construction: pure rescale, no clipping risk
        return _q8(q.astype(jnp.float32) * (s / sig), 1.0), sig


def _block_a(ctx, x, name):
    sig = ctx.group([f"{name}/{b}/conv:out" for b in
                     ("branch1x1", "branch5x5_2", "branch3x3dbl_3",
                      "branch_pool")])
    b1 = ctx.conv(x, (name, "branch1x1", "conv"), emit=sig)
    b5 = ctx.conv(x, (name, "branch5x5_1", "conv"))
    b5 = ctx.conv(b5, (name, "branch5x5_2", "conv"), padding=2, emit=sig)
    bd = ctx.conv(x, (name, "branch3x3dbl_1", "conv"))
    bd = ctx.conv(bd, (name, "branch3x3dbl_2", "conv"), padding=1)
    bd = ctx.conv(bd, (name, "branch3x3dbl_3", "conv"), padding=1, emit=sig)
    bp = ctx.avg_pool_f(x, 3, 1, 1)
    bp = ctx.conv(bp, (name, "branch_pool", "conv"), emit=sig)
    return ctx.concat([b1, b5, bd, bp], sig)


def _block_b(ctx, x, name):
    extra = [x] if not ctx.calib else []
    sig = ctx.group([f"{name}/branch3x3/conv:out",
                     f"{name}/branch3x3dbl_3/conv:out"], extra=extra)
    b3 = ctx.conv(x, (name, "branch3x3", "conv"), stride=2, emit=sig)
    bd = ctx.conv(x, (name, "branch3x3dbl_1", "conv"))
    bd = ctx.conv(bd, (name, "branch3x3dbl_2", "conv"), padding=1)
    bd = ctx.conv(bd, (name, "branch3x3dbl_3", "conv"), stride=2, emit=sig)
    bp = ctx.requant(ctx.max_pool(x, 3, 2), sig)
    return ctx.concat([b3, bd, bp], sig)


def _block_c(ctx, x, name):
    sig = ctx.group([f"{name}/{b}/conv:out" for b in
                     ("branch1x1", "branch7x7_3", "branch7x7dbl_5",
                      "branch_pool")])
    b1 = ctx.conv(x, (name, "branch1x1", "conv"), emit=sig)
    b7 = ctx.conv(x, (name, "branch7x7_1", "conv"))
    b7 = ctx.conv(b7, (name, "branch7x7_2", "conv"), padding=(0, 3))
    b7 = ctx.conv(b7, (name, "branch7x7_3", "conv"), padding=(3, 0), emit=sig)
    bd = ctx.conv(x, (name, "branch7x7dbl_1", "conv"))
    bd = ctx.conv(bd, (name, "branch7x7dbl_2", "conv"), padding=(3, 0))
    bd = ctx.conv(bd, (name, "branch7x7dbl_3", "conv"), padding=(0, 3))
    bd = ctx.conv(bd, (name, "branch7x7dbl_4", "conv"), padding=(3, 0))
    bd = ctx.conv(bd, (name, "branch7x7dbl_5", "conv"), padding=(0, 3),
                  emit=sig)
    bp = ctx.avg_pool_f(x, 3, 1, 1)
    bp = ctx.conv(bp, (name, "branch_pool", "conv"), emit=sig)
    return ctx.concat([b1, b7, bd, bp], sig)


def _block_d(ctx, x, name):
    extra = [x] if not ctx.calib else []
    sig = ctx.group([f"{name}/branch3x3_2/conv:out",
                     f"{name}/branch7x7x3_4/conv:out"], extra=extra)
    b3 = ctx.conv(x, (name, "branch3x3_1", "conv"))
    b3 = ctx.conv(b3, (name, "branch3x3_2", "conv"), stride=2, emit=sig)
    b7 = ctx.conv(x, (name, "branch7x7x3_1", "conv"))
    b7 = ctx.conv(b7, (name, "branch7x7x3_2", "conv"), padding=(0, 3))
    b7 = ctx.conv(b7, (name, "branch7x7x3_3", "conv"), padding=(3, 0))
    b7 = ctx.conv(b7, (name, "branch7x7x3_4", "conv"), stride=2, emit=sig)
    bp = ctx.requant(ctx.max_pool(x, 3, 2), sig)
    return ctx.concat([b3, b7, bp], sig)


def _block_e(ctx, x, name, final=False):
    # torchvision concat order: [b1, b3a, b3b, bda, bdb, bp] (the inner
    # branch concats flatten into the block concat)
    sig = None if final else ctx.group(
        [f"{name}/{b}/conv:out" for b in
         ("branch1x1", "branch3x3_2a", "branch3x3_2b", "branch3x3dbl_3a",
          "branch3x3dbl_3b", "branch_pool")])
    emit = None if final else sig
    b1 = ctx.conv(x, (name, "branch1x1", "conv"), emit=emit)
    b3 = ctx.conv(x, (name, "branch3x3_1", "conv"))
    b3a = ctx.conv(b3, (name, "branch3x3_2a", "conv"), padding=(0, 1),
                   emit=emit)
    b3b = ctx.conv(b3, (name, "branch3x3_2b", "conv"), padding=(1, 0),
                   emit=emit)
    bd = ctx.conv(x, (name, "branch3x3dbl_1", "conv"))
    bd = ctx.conv(bd, (name, "branch3x3dbl_2", "conv"), padding=1)
    bda = ctx.conv(bd, (name, "branch3x3dbl_3a", "conv"), padding=(0, 1),
                   emit=emit)
    bdb = ctx.conv(bd, (name, "branch3x3dbl_3b", "conv"), padding=(1, 0),
                   emit=emit)
    bp = ctx.avg_pool_f(x, 3, 1, 1)
    bp = ctx.conv(bp, (name, "branch_pool", "conv"), emit=emit)
    parts = [b1, b3a, b3b, bda, bdb, bp]
    if final:  # float parts feed the head directly
        return jnp.concatenate(parts, axis=-1)
    return ctx.concat(parts, sig)


def _graph(ctx, x, transform_input):
    x = x.astype(jnp.float32)
    if transform_input:  # torchvision pretrained-mode channel renorm
        x = transform_input_renorm(x)
    x = ctx.conv(x, ("Conv2d_1a_3x3", "conv"), stride=2)
    x = ctx.conv(x, ("Conv2d_2a_3x3", "conv"))
    x = ctx.conv(x, ("Conv2d_2b_3x3", "conv"), padding=1)
    x = ctx.max_pool(x, 3, 2)
    x = ctx.conv(x, ("Conv2d_3b_1x1", "conv"))
    x = ctx.conv(x, ("Conv2d_4a_3x3", "conv"))
    x = ctx.max_pool(x, 3, 2)
    x = _block_a(ctx, x, "Mixed_5b")
    x = _block_a(ctx, x, "Mixed_5c")
    x = _block_a(ctx, x, "Mixed_5d")
    x = _block_b(ctx, x, "Mixed_6a")
    x = _block_c(ctx, x, "Mixed_6b")
    x = _block_c(ctx, x, "Mixed_6c")
    x = _block_c(ctx, x, "Mixed_6d")
    x = _block_c(ctx, x, "Mixed_6e")
    x = _block_d(ctx, x, "Mixed_7a")
    x = _block_e(ctx, x, "Mixed_7b")
    x = _block_e(ctx, x, "Mixed_7c", final=True)
    # head: global avg pool → (dropout: eval identity) → fc, full precision
    x = jnp.mean(x, axis=(1, 2))
    fc = ctx.p["fc"]
    x = x.astype(ctx.dtype) @ fc["kernel"].astype(ctx.dtype) \
        + fc["bias"].astype(ctx.dtype)
    return x.astype(jnp.float32)


make_calib_fn, make_quant_predict = make_entrypoints(
    _CalibCtx, _QuantCtx, _graph, lambda m: (m.transform_input,))
