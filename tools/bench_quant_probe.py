"""Decision probe: would an int8-RESIDENT graph pay for densenet121?

efficientnet taught us to MEASURE before building a resident graph
(interceptor int8 clocked 6.5% SLOWER there, BASELINE.md round-3 table).
densenet is the remaining un-quantized BN family; it cannot BN-fold
(BN precedes each conv behind a relu — models/fold.py excludes it), so
its int8 story must carry the eval BN as an elementwise prologue.

This probe times the exact per-layer pattern of a DenseNet bottleneck
(reference torchvision densenet._DenseLayer: norm1→relu→conv1x1(128)→
norm2→relu→conv3x3(32)) at densenet121's dominant shapes, three ways:

  bf16:  bn(affine) → relu → conv                     [today's eval path]
  int8:  s8 input → dequant+bn+relu+quantize → s8 conv → f32 epilogue
         (what a resident graph would run; concat stays s8 in HBM)

Per-shape speedup tells us whether the resident graph is worth building.
Usage (TPU): python tools/bench_quant_probe.py [--batch 256] [--iters 30]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ifcb_classifier_tpu.utils.config import enable_compile_cache
    enable_compile_cache()

    DN = ("NHWC", "HWIO", "NHWC")
    B = args.batch

    # densenet121 @224: (tag, H, C_in, C_out, k, n_occurrences)
    # n is how many times the shape class appears in the net, so the
    # "weighted" summary approximates the whole-model balance.
    shapes = [
        ("blk1 1x1", 56, 160, 128, 1, 6),    # mid-block concat width
        ("blk1 3x3", 56, 128, 32, 3, 6),
        ("trans1",   56, 256, 128, 1, 1),
        ("blk2 1x1", 28, 320, 128, 1, 12),
        ("blk2 3x3", 28, 128, 32, 3, 12),
        ("blk3 1x1", 14, 640, 128, 1, 24),
        ("blk3 3x3", 14, 128, 32, 3, 24),
        ("trans3",   14, 1024, 512, 1, 1),
        ("blk4 1x1", 7, 768, 128, 1, 16),
    ]

    def timeit(fn, *xs):
        c = jax.jit(fn).lower(*xs).compile()
        c(*xs)[1].block_until_ready()
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = c(*xs)
        _ = float(out[1])
        return (time.perf_counter() - t0) / args.iters * 1e3

    tot_bf16 = tot_int8 = 0.0
    print(f"densenet121 layer-pattern probe, b{B}, {args.iters} iters "
          f"(ms, lower is better)")
    for tag, H, ci, co, k, n in shapes:
        rng = np.random.RandomState(0)
        pad = ((k // 2, k // 2),) * 2
        w = jnp.asarray(rng.randn(k, k, ci, co) * 0.05, jnp.bfloat16)
        scale = jnp.asarray(rng.rand(ci) + 0.5, jnp.float32)
        shift = jnp.asarray(rng.randn(ci) * 0.1, jnp.float32)
        x = jnp.asarray(rng.randn(B, H, H, ci), jnp.bfloat16)

        def f_bf16(x, w):
            xf = x.astype(jnp.float32) * scale + shift  # eval BN affine
            xf = jnp.maximum(xf, 0.0).astype(jnp.bfloat16)
            y = lax.conv_general_dilated(
                xf, w, (1, 1), pad, dimension_numbers=DN,
                preferred_element_type=jnp.bfloat16)
            return y, jnp.sum(y.astype(jnp.float32))

        ms_b = timeit(f_bf16, x, w)

        x8 = jnp.asarray(rng.randint(-127, 128, (B, H, H, ci)), jnp.int8)
        w8 = jnp.asarray(rng.randint(-127, 128, (k, k, ci, co)), jnp.int8)
        wsc = jnp.asarray(rng.rand(co) * 1e-2, jnp.float32)

        def f_int8(x8, w8):
            # dequant + BN affine + relu + requant rides one elementwise
            # fusion; conv runs s8xs8->s32 on the MXU; epilogue requantizes
            # so the output (the next concat slice) stays s8 in HBM.
            xf = x8.astype(jnp.float32) * 0.043     # per-tensor act scale
            xf = jnp.maximum(xf * scale + shift, 0.0)
            xq = jnp.clip(jnp.round(xf * 12.7), -127, 127).astype(jnp.int8)
            y = lax.conv_general_dilated(
                x8q := xq, w8, (1, 1), pad, dimension_numbers=DN,
                preferred_element_type=jnp.int32)
            yf = y.astype(jnp.float32) * wsc
            yq = jnp.clip(jnp.round(yf * 9.1), -127, 127).astype(jnp.int8)
            return yq, jnp.sum(yf)

        ms_i = timeit(f_int8, x8, w8)
        tot_bf16 += ms_b * n
        tot_int8 += ms_i * n
        print(f"  {tag:10s} {H:3d}² {ci:4d}->{co:4d} k{k}  "
              f"bf16 {ms_b:7.3f}  int8 {ms_i:7.3f}  "
              f"speedup {ms_b / ms_i:5.2f}x  (xN={n})")
    print(f"\nweighted total: bf16 {tot_bf16:.1f} ms vs int8 "
          f"{tot_int8:.1f} ms -> {tot_bf16 / tot_int8:.2f}x")
    print("NOTE per-shape dispatch overhead inflates both sides equally "
          "on the tunnel; the ratio is the decision datum.")


if __name__ == "__main__":
    main()
