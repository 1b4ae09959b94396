"""Pallas TPU kernel: fused uint8-canvas → resized+normalized float batch.

The XLA path (ops/preprocess.py) materializes per-image resize weight
matrices and intermediate f32 tensors in HBM between fusions. This kernel
does the whole per-image pipeline in VMEM in one pass:

  u8 canvas tile → f32 → W_h @ img @ W_w^T (two MXU dots, weights built
  in-register from the image's true (h,w) via iota) → /255 → (x-mean)/std
  → out tile

Grid: one program per image. Scalar-prefetched (h,w) sizes feed the weight
construction (pltpu.PrefetchScalarGridSpec) so each image in the batch can
have a different true size with fully static shapes — same contract as the
XLA path.

Used for the grayscale bin-inference hot path when it measures faster
(see tools/bench_pallas.py); correctness is locked to the XLA path by
tests/test_pallas.py (interpret mode on CPU, real kernel on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _weights(src, size_canvas: int, size_out: int):
    """PIL-BILINEAR row-resample matrix [size_out, size_canvas] for a traced
    true extent `src` — same math as ops.preprocess.resize_weights."""
    dtype = jnp.float32
    src = src.astype(dtype)
    scale = src / size_out
    fscale = jnp.maximum(scale, 1.0)
    # Mosaic tpu.iota is integer-only; build int32 and cast
    i = jax.lax.broadcasted_iota(jnp.int32, (size_out, size_canvas), 0
                                 ).astype(dtype)
    j = jax.lax.broadcasted_iota(jnp.int32, (size_out, size_canvas), 1
                                 ).astype(dtype)
    center = (i + 0.5) * scale
    w = jnp.maximum(0.0, 1.0 - jnp.abs(j + 0.5 - center) / fscale)
    w = jnp.where(j < src, w, 0.0)
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9)


def preprocess_gray_pallas(canvas, sizes, *, out_size: int, mean=None,
                           std=None, interpret=False):
    """canvas: uint8 [B,S,S]; sizes: int32 [B,2] → f32 [B,out,out].

    Grayscale single-channel output (broadcast to RGB outside — cheaper than
    3x the resize work). mean/std: optional scalars (gray normalization; the
    per-channel broadcast happens after RGB expansion in the caller when the
    channels differ).
    """
    B, S, _ = canvas.shape
    r = out_size

    def kernel(sizes_ref, canvas_ref, out_ref):
        b = pl.program_id(0)
        h = sizes_ref[b, 0]
        w = sizes_ref[b, 1]
        wh = _weights(h, S, r)                             # [r, S]
        ww = _weights(w, S, r)                             # [r, S]
        # Mosaic has no direct u8->f32 cast; hop through i32 (exact for 0..255)
        img = canvas_ref[0].astype(jnp.int32).astype(jnp.float32)  # [S, S]
        t = jax.lax.dot_general(wh, img, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [r, S]
        t = jax.lax.dot_general(t, ww, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [r, r]
        t = t * (1.0 / 255.0)
        t = jnp.clip(t, 0.0, 1.0)
        if mean is not None:
            t = (t - mean) / std
        out_ref[0] = t

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, S, S), lambda b, sz: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, r, r), lambda b, sz: (b, 0, 0)),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, r, r), jnp.float32),
        interpret=interpret,
    )(sizes, canvas)
