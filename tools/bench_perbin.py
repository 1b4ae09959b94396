"""Per-bin RUN throughput A/B: batch-bucket ladder vs full-batch dispatch.

The reference classifies each bin with a full Trainer batch regardless of bin
size (/root/reference/neuston_net.py:266). Our default per-bin path inherits
the pad cost at batch 256 unless --gobig; the batch-bucket ladder
(infer/runner.py `_batch_buckets`) pads each dispatch to the smallest
compiled bucket instead. This measures the small-bin deployment workload
(default: 30 bins x 40 ROIs, mixed ladder sizes) on the real TPU, engine
built exactly like the product (folded bf16 inception_v3 @299).

    python tools/bench_perbin.py [--bins 30] [--rois 40] [--batch 256]
                                 [--trials 3] [--gobig]
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_ckpt(path, model_name, resize):
    import jax
    import numpy as np
    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
    model = get_namebrand_model(model_name, 3, pretrained=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        np.zeros((1, resize, resize, 3), np.float32), train=False)
    save_checkpoint(path, jax.device_get(variables["params"]),
                    jax.device_get(variables.get("batch_stats", {})),
                    dict(MODEL=model_name, classes=["a", "b", "c"],
                         resize=resize, model_id="bench", seed=1,
                         img_norm=None, pretrained=False))
    return path


def run_pass(engine, bins, gobig=False):
    from ifcb_classifier_tpu.data.ifcb import Bin
    n = 0
    t0 = time.perf_counter()
    if gobig:
        done = []
        agg = engine.gobig(lambda b, t, p: done.append(len(t)),
                           lambda b, e: (_ for _ in ()).throw(e))
        for path in bins:
            b = Bin(path)
            agg.add_bin(b, b)
        agg.flush()
        n = sum(done)
    else:
        for path in bins:
            targets, probs = engine.predict_bin(Bin(path))
            n += len(targets)
    dt = time.perf_counter() - t0
    return n, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bins", type=int, default=30)
    ap.add_argument("--rois", type=int, default=40)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--model", default="inception_v3")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--gobig", action="store_true",
                    help="also measure the gobig aggregator for context")
    ap.add_argument("--corpus", default=None,
                    help="reuse an existing bin directory instead of synth")
    ap.add_argument("--v1", action="store_true",
                    help="ALL-schema-v1 corpus with mixed stitched-frame "
                         "sizes: the legacy workload served by "
                         "predict_images (ladder-major packing + batch "
                         "buckets), not the native .roi packer")
    args = ap.parse_args()

    from ifcb_classifier_tpu.utils.config import enable_compile_cache
    enable_compile_cache()
    import numpy as np

    tmp = tempfile.mkdtemp(prefix="perbin_")
    if args.corpus:
        bin_dir = args.corpus
    else:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from make_demo_corpus import write_bins, write_v1_bins
        bin_dir = os.path.join(tmp, "bins")
        if args.v1:
            write_v1_bins(bin_dir, np.random.default_rng(0),
                          n_bins=args.bins, rois_per_bin=args.rois)
        else:
            write_bins(bin_dir, np.random.default_rng(0), n_bins=args.bins,
                       rois_per_bin=args.rois, include_v1=False)
    bins = sorted(glob.glob(os.path.join(bin_dir, "**", "*.adc"),
                            recursive=True))
    assert bins, f"no bins under {bin_dir}"

    from ifcb_classifier_tpu.models import input_size_for
    resize = input_size_for(args.model)
    ckpt = build_ckpt(os.path.join(tmp, "m.ptl"), args.model, resize)

    from ifcb_classifier_tpu.infer.runner import InferenceEngine
    out = {"bins": len(bins), "batch": args.batch, "model": args.model,
           "schema": "v1" if args.v1 else "v2"}
    # explicit True/False (not default None): an inherited
    # IFCBNN_NO_BATCH_LADDER=1 must not silently turn this into
    # full-batch-vs-full-batch with a bogus ~1.0x "speedup"
    for tag, kw in (("bucketed", {"batch_ladder": True}),
                    ("full_batch", {"batch_ladder": False})):
        engine = InferenceEngine(ckpt, batch_size=args.batch, **kw)
        run_pass(engine, bins)  # warm: compile every bucket/ladder shape
        best_n, best_dt = 0, float("inf")
        for _ in range(args.trials):
            n, dt = run_pass(engine, bins)
            if dt < best_dt:
                best_n, best_dt = n, dt
        out[f"{tag}_s"] = round(best_dt, 3)
        out[f"{tag}_img_s"] = round(best_n / best_dt, 1)
        out[f"{tag}_buckets"] = list(engine.batch_buckets)
        print(f"{tag:10s}: {best_dt:7.3f} s ({best_n / best_dt:8.1f} img/s) "
              f"buckets={engine.batch_buckets}", flush=True)
        if args.gobig and tag == "bucketed":
            run_pass(engine, bins, gobig=True)
            gn, gdt = min((run_pass(engine, bins, gobig=True)
                           for _ in range(args.trials)),
                          key=lambda x: x[1])
            out["gobig_s"] = round(gdt, 3)
            out["gobig_img_s"] = round(gn / gdt, 1)
            print(f"{'gobig':10s}: {gdt:7.3f} s ({gn / gdt:8.1f} img/s)",
                  flush=True)
    out["speedup"] = round(out["full_batch_s"] / out["bucketed_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
