"""Fused on-device input preprocessing: resize-as-matmul + normalize + flip.

The reference preprocesses every image on the host in Python loader workers —
PIL decode → PIL bilinear resize → ToTensor → Normalize
(/root/reference/neuston_data.py:257-263,342-371,456-464). That per-image
Python/PIL path is its input bottleneck (SURVEY.md §3.1).

Here the host only decodes bytes to uint8 and packs variable-size images into
a fixed uint8 canvas (see data/pipeline.py); everything else runs on the TPU
in one jit:

  uint8 canvas [B,Hc,Wc,C] + per-image (h,w)
    → per-image separable resize to (r,r) expressed as TWO MATMULS on the MXU
    → scale to [0,1], optional (x-mean)/std channel normalization
    → optional random flips under an explicit PRNG key
    → bf16/f32 NHWC batch for the model

Resize-as-matmul: a separable antialiased triangle (bilinear) filter is a
linear map per axis, so resize(img) = W_h @ img @ W_w^T with W built on the
fly from *traced* per-image sizes via broadcasted_iota — every image in the
batch can have a different true size while all shapes stay static (XLA/MXU
friendly). The weights match PIL's BILINEAR resample (triangle kernel,
support scaled by the downscale factor, window renormalization), which is what
torchvision 0.8.2's `transforms.Resize` uses, so outputs track the reference
within uint8 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["resize_weights", "resize_bilinear_matmul", "make_preprocessor",
           "preprocess_batch"]


def resize_weights(src_size, canvas_size: int, out_size: int, dtype=jnp.float32):
    """[out_size, canvas_size] PIL-BILINEAR resampling matrix.

    `src_size` (true image extent within the canvas) may be a traced scalar;
    `canvas_size` and `out_size` are static. Rows are normalized over the
    in-bounds taps, so canvas padding beyond src_size never leaks in.
    """
    src = jnp.asarray(src_size, dtype)
    scale = src / out_size
    fscale = jnp.maximum(scale, 1.0)  # antialias: widen kernel when downscaling
    i = jax.lax.broadcasted_iota(dtype, (out_size, canvas_size), 0)
    j = jax.lax.broadcasted_iota(dtype, (out_size, canvas_size), 1)
    center = (i + 0.5) * scale
    w = jnp.maximum(0.0, 1.0 - jnp.abs(j + 0.5 - center) / fscale)
    w = jnp.where(j < src, w, 0.0)
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9)


def resize_bilinear_matmul(img, h, w, out_size: int, dtype=jnp.float32):
    """Resize one canvas-packed image [Hc,Wc,C] to [out,out,C] via two matmuls.

    h, w: traced true extents. Equivalent to PIL Image.resize((out,out),
    BILINEAR) on the (h,w) crop — the reference's aspect-distorting square
    `Resize([r,r])` (neuston_data.py:345), deliberately not pad-to-square.
    """
    wh = resize_weights(h, img.shape[0], out_size, dtype)   # [r, Hc]
    ww = resize_weights(w, img.shape[1], out_size, dtype)   # [r, Wc]
    x = img.astype(dtype)
    # [r,Hc] @ [Hc,Wc,C] then contract W: both land on the MXU.
    x = jnp.einsum("rh,hwc->rwc", wh, x, preferred_element_type=dtype)
    x = jnp.einsum("sw,rwc->rsc", ww, x, preferred_element_type=dtype)
    return x


def _flip_batch(x, rng, flip_x: bool, flip_y: bool):
    """Random 50% per-image flips. Reference quirk kept (neuston_data.py:356-361):
    --flip x = vertical flip (rows), --flip y = horizontal flip (cols)."""
    B = x.shape[0]
    kx, ky = jax.random.split(rng)
    if flip_x:
        do = jax.random.bernoulli(kx, 0.5, (B, 1, 1, 1))
        x = jnp.where(do, x[:, ::-1, :, :], x)
    if flip_y:
        do = jax.random.bernoulli(ky, 0.5, (B, 1, 1, 1))
        x = jnp.where(do, x[:, :, ::-1, :], x)
    return x


def preprocess_batch(canvas, sizes, rng=None, *, out_size, mean=None, std=None,
                     flip_x=False, flip_y=False, dtype=jnp.float32):
    """canvas: uint8 [B,Hc,Wc] (grayscale ROIs) or [B,Hc,Wc,3] (decoded images);
    sizes: int32 [B,2] true (h,w) per image. Returns [B,out,out,3] in `dtype`.

    Pipeline parity: /255 (ToTensor), grayscale→RGB broadcast (the reference's
    ToPILImage('L').convert('RGB'), neuston_data.py:457-459), optional
    Normalize(mean,std) (neuston_data.py:347-350), optional flips.
    """
    gray = canvas.ndim == 3

    if gray:
        # channel-free batched matmuls: [B,r,S]@[B,S,S]@[B,S,r] — clean MXU
        # batched-GEMM shapes (the einsum-with-channel form lowers poorly)
        wh = jax.vmap(lambda h: resize_weights(h, canvas.shape[1], out_size)
                      )(sizes[:, 0])
        ww = jax.vmap(lambda w: resize_weights(w, canvas.shape[2], out_size)
                      )(sizes[:, 1])
        x = jnp.matmul(wh, canvas.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        x = jnp.matmul(x, ww.transpose(0, 2, 1),
                       preferred_element_type=jnp.float32)
        x = x[..., None]
    else:
        resize = functools.partial(resize_bilinear_matmul, out_size=out_size,
                                   dtype=jnp.float32)
        x = jax.vmap(resize)(canvas, sizes[:, 0], sizes[:, 1])  # [B,r,r,C]
    x = x * (1.0 / 255.0)
    x = jnp.clip(x, 0.0, 1.0)

    if gray:
        x = jnp.broadcast_to(x, x.shape[:3] + (3,))
    if mean is not None:
        mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, 3)
        std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, 3)
        x = (x - mean) / std
    if (flip_x or flip_y) and rng is not None:
        x = _flip_batch(x, rng, flip_x, flip_y)
    return x.astype(dtype)


def make_preprocessor(out_size, mean=None, std=None, flip_x=False, flip_y=False,
                      dtype=jnp.float32):
    """jit-compiled preprocess closure; one compile per (canvas-shape, flags)."""
    fn = functools.partial(preprocess_batch, out_size=out_size, mean=mean, std=std,
                           flip_x=flip_x, flip_y=flip_y, dtype=dtype)
    return jax.jit(fn)
