"""TPU decision bench: Pallas fused gray preprocess vs the XLA
resize-as-matmul path (ops/preprocess.py) — the gate cited by
ops/pallas_preprocess.py for whether the kernel is wired into the bin
inference hot path.

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

    from ifcb_classifier_tpu.ops.pallas_preprocess import preprocess_gray_pallas
    from ifcb_classifier_tpu.ops.preprocess import preprocess_batch
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
