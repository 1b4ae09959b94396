"""TPU decision bench: Pallas fused gray preprocess vs the XLA
resize-as-matmul path (ops/preprocess.py).

DECISION (measured 2026-08-16, 1x v5e, B=256 S=128 out=299): the XLA path is
faster — 0.881 ms/batch (290k img/s) vs 1.077 ms/batch (238k img/s) for the
Pallas kernel (0.82x). Neither is remotely the bottleneck (training consumes
~1.9k img/s), so the product ships the XLA path only; the kernel lives HERE
(not in the package) so the measurement stays reproducible without dead
product code. Revisit via the double-buffered HBM->VMEM DMA pattern
(pallas_guide.md) only if input preprocessing ever bottlenecks on real
hardware.

Measures uint8 canvas [B,S,S] → resized/normalized [B,out,out] on the real
TPU, device-resident input, dependency-chained fetch, best of N trials.

Run: python tools/bench_pallas.py [--batch 256] [--canvas 128] [--out 299]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---- the Pallas contender (moved out of the package after losing) ----


def preprocess_gray_pallas_factory():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _weights(src, size_canvas, size_out):
        dtype = jnp.float32
        src = src.astype(dtype)
        scale = src / size_out
        fscale = jnp.maximum(scale, 1.0)
        i = jax.lax.broadcasted_iota(jnp.int32, (size_out, size_canvas), 0
                                     ).astype(dtype)
        j = jax.lax.broadcasted_iota(jnp.int32, (size_out, size_canvas), 1
                                     ).astype(dtype)
        center = (i + 0.5) * scale
        w = jnp.maximum(0.0, 1.0 - jnp.abs(j + 0.5 - center) / fscale)
        w = jnp.where(j < src, w, 0.0)
        return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9)

    def preprocess_gray_pallas(canvas, sizes, *, out_size, interpret=False):
        B, S, _ = canvas.shape
        r = out_size

        def kernel(sizes_ref, canvas_ref, out_ref):
            b = pl.program_id(0)
            h = sizes_ref[b, 0]
            w = sizes_ref[b, 1]
            wh = _weights(h, S, r)
            ww = _weights(w, S, r)
            img = canvas_ref[0].astype(jnp.int32).astype(jnp.float32)
            t = jax.lax.dot_general(wh, img, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            t = jax.lax.dot_general(t, ww, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            t = t * (1.0 / 255.0)
            out_ref[0] = jnp.clip(t, 0.0, 1.0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, S, S), lambda b, sz: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, r, r), lambda b, sz: (b, 0, 0)),
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, r, r), jnp.float32),
            interpret=interpret)(sizes, canvas)

    return preprocess_gray_pallas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--canvas", type=int, default=128)
    ap.add_argument("--out", type=int, default=299)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ifcb_classifier_tpu.ops.preprocess import preprocess_batch
    preprocess_gray_pallas = preprocess_gray_pallas_factory()
    from ifcb_classifier_tpu.utils.config import enable_compile_cache

    enable_compile_cache()
    B, S, r = args.batch, args.canvas, args.out
    rng = np.random.RandomState(0)
    canvas = jax.device_put(rng.randint(0, 256, (B, S, S), np.uint8))
    sizes = jax.device_put(
        rng.randint(16, S + 1, (B, 2)).astype(np.int32))

    @jax.jit
    def xla_path(canvas, sizes, acc):
        x = preprocess_batch(canvas, sizes, out_size=r, dtype=jnp.float32)
        return acc + jnp.sum(x[:, :, :, 0])

    @jax.jit
    def pallas_path(canvas, sizes, acc):
        x = preprocess_gray_pallas(canvas, sizes, out_size=r)
        return acc + jnp.sum(x)

    results = {}
    for tag, fn in (("xla", xla_path), ("pallas", pallas_path)):
        try:
            acc = fn(canvas, sizes, jnp.zeros((), jnp.float32))
            _ = float(acc)
        except Exception as e:
            print(f"{tag}: FAILED to compile/run: {type(e).__name__}: {e}",
                  flush=True)
            results[f"{tag}_ms"] = None
            continue
        best = float("inf")
        for _ in range(args.trials):
            acc = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                acc = fn(canvas, sizes, acc)
            _ = float(acc)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        results[f"{tag}_ms"] = round(best * 1e3, 3)
        results[f"{tag}_img_s"] = round(B / best, 1)
        print(f"{tag:6s}: {best*1e3:7.3f} ms/batch ({B/best:9.1f} img/s)",
              flush=True)

    if results.get("xla_ms") and results.get("pallas_ms"):
        results["pallas_speedup"] = round(
            results["xla_ms"] / results["pallas_ms"], 3)
        print("pallas speedup vs xla: %.3fx" % results["pallas_speedup"])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
