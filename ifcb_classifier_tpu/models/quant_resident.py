"""Shared plumbing for the int8-RESIDENT graph modules.

The per-family resident graphs (models/quant_graph.py — inception,
models/quant_resnet.py, models/quant_vgg.py) differ only in topology;
the quantize helpers, ctx state, the activation-scale rule
(absmax/127, floored at 1e-12) and the make_calib_fn/make_quant_predict
entrypoint contracts are identical and live HERE exactly once, so a fix
to any of them cannot silently miss a family.

No reference analog: the reference's deployment inference is fp32 eager
torch (/root/reference/neuston_models.py:152-157); the int8 tier is a
beyond-reference TPU optimization (PARITY.md §5, QUIRKS.md)."""

from __future__ import annotations

import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def _norm(stride, padding):
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    p = (padding, padding) if isinstance(padding, int) else tuple(padding)
    return s, ((p[0], p[0]), (p[1], p[1]))


def _q8(y, inv_scale):
    return jnp.clip(jnp.round(y * inv_scale), -127, 127).astype(jnp.int8)


class CalibCtxBase:
    """Float forward over the folded params, recording per-edge absmax
    into `records` and conv geometry into `geoms` (the contract
    quant.quantize_params consumes)."""

    calib = True

    def __init__(self, params, records, geoms, dtype):
        self.p, self.records, self.geoms, self.dtype = \
            params, records, geoms, dtype

    def _rec(self, key, x):
        self.records[key] = jnp.max(jnp.abs(x.astype(jnp.float32)))

    def emit(self, y, key):
        return y  # scales exist only in the quantized pass


class QuantCtxBase:
    """int8-resident forward: activations are (int8 array, python-float
    scale) pairs between convs; `pruned` carries only the un-quantized
    leaves (the classifier head), `qconv` the per-conv int8
    weights/scales/biases from quant.quantize_params."""

    calib = False

    def __init__(self, pruned, qconv, absmax, dtype):
        self.p, self.qconv, self.absmax, self.dtype = \
            pruned, qconv, absmax, dtype

    def _scale(self, key):
        return max(float(self.absmax[key]), 1e-12) / 127.0

    def emit(self, y, key):
        s = self._scale(key)
        return _q8(y.astype(jnp.float32), 1.0 / s), s


def make_entrypoints(calib_cls, quant_cls, graph, model_extras):
    """Build the (make_calib_fn, make_quant_predict) pair for one resident
    graph module — drop-ins for quant.make_calib_fn/make_quant_predict.

    graph(ctx, images, *extras) runs the family topology under either ctx;
    model_extras(model) -> tuple of the static attrs the graph needs."""

    def make_calib_fn(model):
        geoms = {}
        extras = model_extras(model)

        def calib_fn(params, batch_stats, images):
            records = {}
            ctx = calib_cls(params, records, geoms, model.dtype)
            graph(ctx, images, *extras)
            return records

        return calib_fn, geoms

    def make_quant_predict(model, absmax, geoms):
        import jax

        from .quant import _QUANT_KEY
        extras = model_extras(model)

        def predict(params, batch_stats, images):
            params = dict(params)
            qconv = params.pop(_QUANT_KEY)
            ctx = quant_cls(params, qconv, absmax, model.dtype)
            logits = graph(ctx, images, *extras)
            return jax.nn.softmax(logits, axis=-1)

        return predict

    return make_calib_fn, make_quant_predict
