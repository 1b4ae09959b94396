"""int8-RESIDENT inference graph for the vgg*_bn families (RUN int8 tier).

Same scheme as models/quant_graph.py (inception) and models/quant_resnet.py
(resnets): the generic interceptor (models/quant.py) materializes every
activation twice (dequantized bf16 + the next conv's re-quantized s8 copy);
here every post-relu tensor lives in HBM as int8 exactly once and the
dequantize→bias→relu→requantize chain rides each conv's epilogue fusion.
VGG is the cleanest case — a pure conv→relu(→maxpool) chain with no
branches — so the quantization points are the interceptor's EXACTLY:

  * each conv's input per-tensor absmax ('<path>:in'), per-channel int8
    weights, classifier Denses full precision;
  * each relu output is quantized at the NEXT conv's input scale; where a
    2×2/stride-2 maxpool sits between them, quantizing before the pool at
    the post-pool scale is exact (max commutes with monotonic
    quantization, non-negative inputs + full window coverage ⇒ equal
    absmax);
  * the LAST conv block stays float into adaptive_avg_pool + classifier
    (the interceptor graph is float there too — no extra quant point).

tests/test_quant.py pins resident-vs-interceptor and vs-fp32 agreement.
Reference workload: RUN's per-bin forward (/root/reference/
neuston_net.py:233-271) on the vgg families (neuston_models.py:34-36).
Parameters come from the BN-folded tree (models/fold.py). Enable/disable:
IFCBNN_QUANT_RESIDENT=0 falls back to the interceptor (A/B lever)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .layers import adaptive_avg_pool
from .quant import _tree_get
from .quant_resident import (_DN, _q8, CalibCtxBase, QuantCtxBase,
                             make_entrypoints)
from .vgg import VGG_CFGS

_PADS = ((1, 1), (1, 1))


def _conv_layers(cfg: str, batch_norm: bool):
    """(layer_idx, follows_pool) for each conv, mirroring VGG.__call__'s
    features_{i} numbering (models/vgg.py:40-55)."""
    out, layer_idx, after_pool = [], 0, False
    for v in VGG_CFGS[cfg]:
        if v == "M":
            layer_idx += 1
            after_pool = True
        else:
            out.append((layer_idx, after_pool))
            layer_idx += 1 + (1 if batch_norm else 0) + 1  # conv(+bn)+relu
            after_pool = False
    return out


class _CalibCtx(CalibCtxBase):
    def conv_relu(self, x, path):
        self.geoms[tuple(path)] = dict(strides=(1, 1), padding=_PADS)
        self._rec("/".join(path) + ":in", x)
        node = _tree_get(self.p, path)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), node["kernel"].astype(self.dtype),
            (1, 1), _PADS, dimension_numbers=_DN,
            preferred_element_type=self.dtype)
        return jnp.maximum(y + node["bias"].astype(self.dtype), 0)

    def maxpool(self, x):
        from .layers import max_pool
        return max_pool(x, 2, 2)

    def to_float(self, x):
        return x


class _QuantCtx(QuantCtxBase):
    def conv_relu(self, x, path):
        key = "/".join(path)
        q = self.qconv[key]
        if isinstance(x, tuple):
            xq, s_x = x
        else:  # the image at the first conv
            s_x = self._scale(key + ":in")
            xq = _q8(x.astype(jnp.float32), 1.0 / s_x)
        y = lax.conv_general_dilated(
            xq, q["w_int8"], (1, 1), _PADS, dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
        y = jnp.maximum(y.astype(jnp.float32) * (q["w_scale"] * s_x)
                        + q["bias"], 0.0)
        return y.astype(self.dtype)  # float; emit() requantizes

    def maxpool(self, x):
        if isinstance(x, tuple):
            q, s = x
            out = lax.reduce_window(
                q, jnp.array(-128, jnp.int8), lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1),
                ((0, 0), (0, 0), (0, 0), (0, 0)))
            return out, s
        from .layers import max_pool
        return max_pool(x, 2, 2)

    def to_float(self, x):
        if isinstance(x, tuple):
            q, s = x
            return (q.astype(jnp.float32) * s).astype(self.dtype)
        return x


def _graph(ctx, x, cfg, batch_norm):
    convs = _conv_layers(cfg, batch_norm)
    x = x.astype(jnp.float32)
    for k, (idx, follows_pool) in enumerate(convs):
        if follows_pool:
            x = ctx.maxpool(x)
        x = ctx.conv_relu(x, (f"features_{idx}", "conv"))
        if k + 1 < len(convs):
            nxt = convs[k + 1][0]
            x = ctx.emit(x, f"features_{nxt}/conv:in")
        # last conv's relu output stays float into the classifier chain
    x = ctx.to_float(ctx.maxpool(x))  # final 'M' of every VGG cfg
    x = adaptive_avg_pool(x, 7)
    x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)  # torch CHW flatten
    d = ctx.dtype
    h = ctx.p["classifier_0"]
    x = jnp.maximum(x.astype(d) @ h["kernel"].astype(d)
                    + h["bias"].astype(d), 0)
    h = ctx.p["classifier_3"]  # dropout: eval identity
    x = jnp.maximum(x.astype(d) @ h["kernel"].astype(d)
                    + h["bias"].astype(d), 0)
    h = ctx.p["classifier_6"]
    x = x.astype(d) @ h["kernel"].astype(d) + h["bias"].astype(d)
    return x.astype(jnp.float32)


make_calib_fn, make_quant_predict = make_entrypoints(
    _CalibCtx, _QuantCtx, _graph, lambda m: (m.cfg, m.batch_norm))
