"""Roofline accounting for the headline train step (VERDICT r2 #1).

Answers, with numbers instead of assertions: is inception_v3 @299 b128 bf16
training compute-bound (MXU) or HBM-bandwidth-bound on this chip — and how
close is the measured step time to that bound?

Method: XLA's own post-fusion cost analysis of the COMPILED executable.
`compiled.cost_analysis()` reports `flops` and `bytes accessed` summed over
the optimized HLO — fusions count operands+outputs once, so "bytes accessed"
is a faithful model of HBM traffic for the program XLA actually runs (it
over-counts only where buffers stay resident in VMEM/caches between ops,
i.e. it is an UPPER bound on traffic → a LOWER bound on achievable time —
conservative in the right direction for "are we at the roofline?").

    T_flops = flops / peak_bf16_flops          (MXU bound)
    T_bytes = bytes / hbm_bandwidth            (HBM bound)
    T_pred  = max(T_flops, T_bytes)            (roofline)

Reports per model: both bounds, which dominates, predicted vs measured
step time, MFU, and HBM utilization. Results feed BASELINE.md's round-3
roofline section. Reference workload being modeled: the reference's
single-GPU fp32 train loop (neuston_net.py:101-115) with the inception
default.

Usage (TPU):  python tools/roofline.py [--models inception_v3,resnet50]
              [--batch 128] [--iters 20] [--trials 3] [--infer]
"""

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# FLOP and HBM peaks both come from bench.py's tables (ONE shared copy —
# a second table here already drifted once; bench now owns _HBM_GBS too)


def chip_peaks():
    import jax

    import bench  # repo root (sys.path above); shares the MXU peak table
    kind = jax.devices()[0].device_kind.lower()
    peak_f = bench._peak_flops()  # honors BENCH_PEAK_TFLOPS override
    if peak_f is None:
        peak_f = float(os.environ.get("BENCH_PEAK_TFLOPS", 197)) * 1e12
    peak_b = bench._hbm_bytes_per_sec()  # honors BENCH_HBM_GBS override
    if peak_b is None:
        peak_b = 819e9
    return kind, (peak_f, peak_b)


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def measure_train(model_name, batch, size, iters, trials, remat=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.state import (create_train_state,
                                                 make_train_step)

    model = get_namebrand_model(model_name, 50, dtype=jnp.bfloat16)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), size)
    step = jax.jit(make_train_step(model, tx, remat=remat), donate_argnums=0)
    rng = np.random.RandomState(0)
    b = dict(images=jnp.asarray(rng.rand(batch, size, size, 3), jnp.float32),
             labels=jnp.asarray(rng.randint(0, 50, batch), jnp.int32),
             mask=jnp.ones((batch,), bool))
    compiled = step.lower(state, b, jax.random.PRNGKey(0)).compile()
    flops, nbytes = cost(compiled)
    for i in range(2):
        state, loss = compiled(state, b, jax.random.PRNGKey(i))
    _ = float(loss)
    times = []
    for _t in range(trials):
        t0 = time.perf_counter()
        for i in range(iters):
            state, loss = compiled(state, b, jax.random.PRNGKey(i))
        _ = float(loss)
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        _ = float(jnp.sum(jnp.abs(leaf).astype(jnp.float32)))
        times.append((time.perf_counter() - t0) / iters)
    return flops, nbytes, statistics.median(times)


def build_infer_graph(model_name, batch, size, fold=True,
                      precision="bf16"):
    """The PRODUCT inference graph build (init → BN fold → device_put →
    optional int8 calibrate+quantize) in ONE place, shared by roofline.py
    and profile_ops.py — the profiler must never drift into profiling a
    different graph than the roofline measures. Returns
    (model, params, stats, predict)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.state import make_predict_step

    model = get_namebrand_model(model_name, 50, dtype=jnp.bfloat16)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, size, size, 3), jnp.float32), train=True)
    # BN-free families (alexnet/squeezenet/plain vgg) have no batch_stats
    params, stats = variables["params"], variables.get("batch_stats", {})
    if fold or precision == "int8":
        from ifcb_classifier_tpu.models.fold import fold_params, supports_fold
        if supports_fold(model_name):
            params, stats = fold_params(model_name, jax.device_get(params),
                                        jax.device_get(stats))
            model = get_namebrand_model(model_name, 50, dtype=jnp.bfloat16,
                                        fold_bn=True)
    # fold_params returns HOST numpy — device_put or every timed call
    # re-pays the full weight transfer over the dev tunnel (~25 MB/s)
    params = jax.device_put(params)
    stats = jax.device_put(stats)
    if precision == "int8":
        from ifcb_classifier_tpu.models.quant import (build_quant_predict,
                                                      supports_quant)
        assert supports_quant(model_name), model_name
        calib_x = jnp.asarray(
            np.random.RandomState(1).rand(batch, size, size, 3), jnp.float32)
        params, predict = build_quant_predict(model, params, stats, calib_x)
    else:
        predict = make_predict_step(model)
    return model, params, stats, predict


def measure_infer(model_name, batch, size, iters, trials, fold=True,
                  copts=None, precision="bf16"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    model, params, stats, predict = build_infer_graph(
        model_name, batch, size, fold=fold, precision=precision)

    @jax.jit
    def run(params, stats, x, acc):
        p = predict(params, stats, x)
        return p, acc + jnp.sum(p)

    x = jnp.asarray(np.random.RandomState(0).rand(batch, size, size, 3),
                    jnp.float32)
    acc0 = jnp.zeros((), jnp.float32)
    # --copts: per-compile XLA options (env XLA_FLAGS with --xla_tpu_* is
    # rejected by the local flag parser — CLAUDE.md)
    compiled = run.lower(params, stats, x, acc0).compile(
        compiler_options=copts or None)
    flops, nbytes = cost(compiled)
    p, acc = compiled(params, stats, x, acc0)
    _ = float(acc)
    times = []
    for _t in range(trials):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _i in range(iters):
            p, acc = compiled(params, stats, x, acc)
        _ = float(acc)
        times.append((time.perf_counter() - t0) / iters)
    did_fold = fold and getattr(model, "fold", False)
    return flops, nbytes, statistics.median(times), did_fold


def report(tag, batch, flops, nbytes, t_meas, peaks):
    peak_f, peak_b = peaks
    t_flops = flops / peak_f
    t_bytes = nbytes / peak_b
    t_pred = max(t_flops, t_bytes)
    bound = "MXU" if t_flops >= t_bytes else "HBM"
    r = dict(
        workload=tag, batch=batch,
        xla_gflops=round(flops / 1e9, 1),
        xla_gbytes=round(nbytes / 1e9, 3),
        arithmetic_intensity=round(flops / max(nbytes, 1), 1),
        t_mxu_ms=round(t_flops * 1e3, 2),
        t_hbm_ms=round(t_bytes * 1e3, 2),
        bound=bound,
        t_predicted_ms=round(t_pred * 1e3, 2),
        t_measured_ms=round(t_meas * 1e3, 2),
        pct_of_roofline=round(100 * t_pred / t_meas, 1),
        imgs_per_sec=round(batch / t_meas, 1),
        mfu_pct=round(100 * flops / t_meas / peak_f, 1),
        hbm_util_pct=round(100 * nbytes / t_meas / peak_b, 1))
    print(json.dumps(r))
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="inception_v3,resnet50")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--infer", action="store_true",
                    help="also profile the (folded) inference graph")
    ap.add_argument("--no-train", action="store_true",
                    help="skip the train measurement (an infer-only sweep "
                         "at batch >=144 must not pay for a spilled-HBM "
                         "train step)")
    ap.add_argument("--remat", nargs="?", const="full", default=False,
                    choices=["full", "convs"],
                    help="full = checkpoint the whole forward (capacity "
                         "play); convs = save conv/matmul/reduction "
                         "outputs, recompute elementwise (bandwidth play)")
    ap.add_argument("--out", default=None, help="write results JSON here")
    ap.add_argument("--precision", default="bf16", choices=["bf16", "int8"],
                    help="precision of the INFER graph (int8 = the "
                         "quantized tier, models/quant.py)")
    ap.add_argument("--copts", default=None,
                    help="comma-separated XLA compiler options k=v for the "
                         "INFER compile (A/B experiments; e.g. "
                         "xla_tpu_enable_latency_hiding_scheduler=true)")
    args = ap.parse_args()
    copts = None
    if args.copts:
        copts = dict(kv.split("=", 1) for kv in args.copts.split(","))

    from ifcb_classifier_tpu.models import input_size_for
    from ifcb_classifier_tpu.utils.config import enable_compile_cache
    enable_compile_cache()
    kind, peaks = chip_peaks()
    print(f"chip: {kind}  peak {peaks[0]/1e12:.0f} TF/s bf16, "
          f"{peaks[1]/1e9:.0f} GB/s HBM")
    results = []
    for m in args.models.split(","):
        size = input_size_for(m)
        if not args.no_train:
            f, nb, t = measure_train(m, args.batch, size, args.iters,
                                     args.trials, remat=args.remat)
            results.append(report(f"{m}@{size} b{args.batch} bf16 train"
                                  + (f" remat={args.remat}" if args.remat
                                     else ""),
                                  args.batch, f, nb, t, peaks))
        if args.infer:
            f, nb, t, did_fold = measure_infer(m, args.batch, size,
                                               args.iters, args.trials,
                                               copts=copts,
                                               precision=args.precision)
            tag = " (folded)" if did_fold else ""
            # int8 convs run the MXU at 2x the bf16 rate (v5e: 394 vs 197
            # TOPS) and XLA's flop count is precision-blind — double the
            # FLOP peak so the MXU bound (and MFU) are honest for int8
            ipeaks = ((peaks[0] * 2, peaks[1])
                      if args.precision == "int8" else peaks)
            results.append(report(f"{m}@{size} b{args.batch} "
                                  f"{args.precision} infer{tag}", args.batch,
                                  f, nb, t, ipeaks))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(dict(chip=kind, peak_flops=peaks[0],
                           peak_hbm=peaks[1], results=results), fh, indent=1)


if __name__ == "__main__":
    main()
