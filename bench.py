"""Headline benchmark: Inception-v3 @299 training images/sec/chip (bf16).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
review fields: per-trial img/s, spread, and MFU (XLA-counted FLOPs per step
against the chip's peak — the roofline accounting VERDICT r2 asked for).

Methodology (CLAUDE.md benchmarking rules): value = MEDIAN of
BENCH_TRIALS (default 5) counted trials of BENCH_ITERS (default 50)
device-resident steps each, after BENCH_WARMUP_TRIALS (default 2)
designated warmup trials that are reported (`warmup_trials`) but excluded
from the statistics — the first trials over the axon tunnel are reliably
cold outliers (VERDICT r3 weak #2; one warmup proved insufficient: the
first *counted* trial still ran ~15% cold on occasion). `spread_pct` is
the full counted range; `iqr_pct` is the interquartile range — both are
trial-level noise diagnostics; the stability claim attaches to the
MEDIAN `value`, reproducible run-to-run to ±0.7% (BASELINE.md "Spread
methodology"). Every trial ends with real
device->host fetches (loss + param checksum) because async completion
over the tunnel over-reports.

The reference publishes no numbers (BASELINE.md); `vs_baseline` divides by
the estimated reference single-GPU throughput recorded in BENCH_BASELINE.json
("ref_gpu_estimate_*", a V100-fp32 era anchor — provenance in BASELINE.md),
falling back to the measured torch-CPU stand-in and then to 1.0.

PERF LEDGER (VERDICT r3 "next" #2): the default run also benches the two
inference tiers (bf16-folded + int8-resident, the RUN product paths) and
embeds `infer_bf16_imgs_per_sec` / `infer_int8_imgs_per_sec`, the anchor
provenance, per-era ratios, and the live HBM-roofline per-chip ceiling in
the same JSON line, so the driver artifact alone settles the perf verdict.
BENCH_LEDGER=0 skips the infer tiers for quick train-only iteration.

WALL BUDGET: BENCH_WALL_BUDGET_S (default 1200; <=0 disables) bounds the
measurement phase on slow-tunnel days — trial loops truncate (marked
`budget_truncated`, >= 1 counted trial) and unstarted ledger tiers are
skipped with an error marker, so the driver always gets a JSON line.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# WALL BUDGET: on a slow-tunnel day each 50-iter trial can take 95-207+ s
# wall (vs ~3 s device), so a full ledger run can exceed the driver's outer
# timeout and record NOTHING. Once the budget is spent, trial loops stop
# after the next completed trial (keeping >= 1 counted trial past the
# warmups, marked `budget_truncated`; a loop ENTERED with the budget
# already spent skips its designated warmups and runs exactly one counted
# trial — the pre-fix behavior overshot by up to n_warm+1 full trials,
# ~10 min at worst-case trial wall) and later ledger tiers are skipped
# with an explicit marker — a degraded artifact instead of a void one.
# BENCH_WALL_BUDGET_S overrides; <= 0 disables. Generous default: a
# good-tunnel full ledger finishes in ~2-5 min, far under it.
#
# The anchor is re-set by main() once the backend watchdog confirms
# devices: the budget bounds the MEASUREMENT phase, so time spent waiting
# on a busy-but-recovering tunnel claim (up to the watchdog's 2700 s)
# must not eat it — with an import-time-only anchor, a claim that
# resolved after ~20 min exhausted the budget before any trial ran.
_BENCH_T0 = time.monotonic()


_warned_budget = set()  # warn once per malformed value, not per trial


def _budget_seconds():
    raw = os.environ.get("BENCH_WALL_BUDGET_S", "1200")
    try:
        return float(raw)
    except ValueError:
        # a malformed knob (e.g. "20m") must degrade to the default, not
        # raise mid-trial-loop and void the artifact this fail-soft knob
        # exists to protect
        if raw not in _warned_budget:
            _warned_budget.add(raw)
            print(f"bench: malformed BENCH_WALL_BUDGET_S={raw!r}; "
                  f"using default 1200", file=sys.stderr)
        return 1200.0


def _budget_left():
    budget = _budget_seconds()
    if budget <= 0:
        return float("inf")
    return budget - (time.monotonic() - _BENCH_T0)


def _vs_baseline(value: float, *keys):
    """value / first present key in BENCH_BASELINE.json; 1.0 if none."""
    base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
    if os.path.isfile(base_file):
        with open(base_file) as f:
            base = json.load(f)
        for k in keys:
            if base.get(k):
                return round(value / float(base[k]), 2)
    return 1.0


# peak dense bf16 TFLOP/s per chip, by jax device_kind substring
_PEAK_TFLOPS = {"v5 lite": 197, "v5e": 197, "v4": 275, "v5p": 459,
                "v6 lite": 918, "v6e": 918, "trillium": 918}

# HBM bytes/s per chip kind (tools/roofline.py imports this — ONE table)
_HBM_GBS = {"v5 lite": 819, "v5e": 819, "v4": 1228, "v5p": 2765,
            "v6 lite": 1640, "v6e": 1640, "trillium": 1640}


def _hbm_bytes_per_sec():
    """Chip HBM bandwidth in bytes/s. BENCH_HBM_GBS overrides; None if the
    chip is unknown (the roofline ceiling is then omitted, not guessed)."""
    import jax
    env = os.environ.get("BENCH_HBM_GBS")
    if env:
        return float(env) * 1e9
    kind = jax.devices()[0].device_kind.lower()
    for key, gb in _HBM_GBS.items():
        if key in kind:
            return gb * 1e9
    return None


def _peak_flops():
    """Chip peak in FLOP/s (bf16). BENCH_PEAK_TFLOPS overrides; None if the
    chip is unknown (MFU is then omitted rather than guessed)."""
    import jax
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    kind = jax.devices()[0].device_kind.lower()
    for key, tf in _PEAK_TFLOPS.items():
        if key in kind:
            return tf * 1e12
    return None


def _xla_cost(compiled, key):
    """One field of XLA's own cost analysis for a compiled executable
    ("flops" / "bytes accessed"), or None if the backend doesn't expose it."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get(key, 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _xla_flops(compiled):
    return _xla_cost(compiled, "flops")


def _iqr_pct(trials, center):
    """Interquartile range as % of the median — less outlier-sensitive
    than the full range (though with 5 trials a single tunnel-noise trial
    still moves a quartile; the run-to-run-stable figure is the median
    itself). None when there are too few trials to quartile."""
    if len(trials) < 4:
        return None
    q = statistics.quantiles(trials, n=4)
    return round(100.0 * (q[2] - q[0]) / center, 2)


def _mfu_fields(flops_per_call, calls_per_sec, peak_scale=1):
    """{"mfu_pct", "tflops_per_sec", ...} — empty when unknowable.

    peak_scale: 2 for int8 graphs — the int8 MXU peak is 2x the bf16
    table entry (v5e: 394 TOPS vs 197 TFLOP/s), and reporting int8 MFU
    against the bf16 peak would overstate utilization ~2x (the roofline
    artifacts tools/roofline.py publishes use the same int8-peak basis)."""
    out = {}
    if flops_per_call:
        achieved = flops_per_call * calls_per_sec
        out["tflops_per_sec"] = round(achieved / 1e12, 2)
        peak = _peak_flops()
        if peak:
            out["mfu_pct"] = round(100.0 * achieved / (peak * peak_scale), 2)
    return out


def bench_infer(precision=None, n_trials=None):
    """Raw-bin batch inference throughput — .roi bytes → native C++ pack →
    device resize+normalize → inception fwd → softmax fetch. The
    BASELINE.json config #5 analog on one chip. Returns the payload dict
    (main() prints it for BENCH_MODE=infer; the default-mode perf ledger
    embeds its `value` fields instead).

    precision: overrides BENCH_PRECISION ("bf16" disables the env knob)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ifcb_classifier_tpu import native
    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.ops.preprocess import preprocess_batch
    from ifcb_classifier_tpu.train.state import make_predict_step
    from ifcb_classifier_tpu.utils.config import enable_compile_cache

    enable_compile_cache()
    B = int(os.environ.get("BENCH_BATCH", "256"))
    S = 128  # typical ROI ladder bucket

    # BENCH_MODEL=resnet50 etc. benches an alternate family through the
    # same product path; the headline stays the inception_v3 default
    model_name = os.environ.get("BENCH_MODEL", "inception_v3")
    from ifcb_classifier_tpu.models import input_size_for
    out_size = int(os.environ.get("BENCH_SIZE", 0)) or \
        input_size_for(model_name)
    model = get_namebrand_model(model_name, 50, dtype=jnp.bfloat16)
    variables = model.init(  # no optimizer state needed for inference
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, out_size, out_size, 3), jnp.float32), train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # BN→conv folding is the InferenceEngine default (models/fold.py);
    # bench the product path. BENCH_FOLD=0 A/Bs the unfolded graph.
    from ifcb_classifier_tpu.models.fold import supports_fold
    folded = (os.environ.get("BENCH_FOLD", "1") != "0"
              and supports_fold(model_name))
    if folded:
        from ifcb_classifier_tpu.models.fold import fold_params
        params, batch_stats = fold_params(
            model_name, jax.device_get(params),
            jax.device_get(batch_stats))
        # fold_params returns HOST numpy — device_put or every timed call
        # re-pays the full weight transfer over the dev tunnel (~25 MB/s)
        params = jax.device_put(params)
        batch_stats = jax.device_put(batch_stats)
        model = get_namebrand_model(model_name, 50, dtype=jnp.bfloat16,
                                    fold_bn=True)
    predict = make_predict_step(model)

    @jax.jit
    def run_batch(params, stats, canvas, sizes, acc):
        x = preprocess_batch(canvas, sizes, out_size=out_size,
                             dtype=jnp.float32)
        probs = predict(params, stats, x)
        # acc threads a data dependency across batches so the final fetch
        # proves every batch completed (CLAUDE.md benchmarking rule)
        return probs, acc + jnp.sum(probs)

    # synthetic .roi buffer: 4096 ROIs of plausible sizes
    rng = np.random.RandomState(0)
    n_rois = int(os.environ.get("BENCH_ROIS", "4096"))
    hs = rng.randint(24, 120, n_rois).astype(np.int64)
    ws = rng.randint(24, 120, n_rois).astype(np.int64)
    starts = np.zeros(n_rois, np.int64)
    off = 0
    for i in range(n_rois):
        starts[i] = off
        off += hs[i] * ws[i]
    roi_buf = rng.randint(0, 256, off, dtype=np.uint8)

    # pack all chunks on the host (native C++), then pre-stage them on the
    # device: the timed loop must measure CHIP throughput, not this dev
    # tunnel's ~25 MB/s host->device link (which bound earlier versions of
    # this bench and swung results 2x run-to-run). The host-side pack rate
    # is reported separately (~12k img/s on this 1-CPU dev host vs ~6.5k
    # chip consumption — the C++ packer threads scale it on real hosts).
    t_pack = time.perf_counter()
    chunks = []
    for c0 in range(0, n_rois, B):
        sel = slice(c0, min(c0 + B, n_rois))
        canvas, sizes = native.pack_rois_native(
            roi_buf, starts[sel], hs[sel], ws[sel], B, S)
        chunks.append((canvas, sizes, sel.stop - sel.start))
    pack_rate = n_rois / (time.perf_counter() - t_pack)
    dev_chunks = [(jax.device_put(c), jax.device_put(s), n)
                  for c, s, n in chunks]

    # BENCH_PRECISION=int8: the quantized speed tier (models/quant.py, the
    # RUN --precision int8 product path). Mirrors the engine's lazy
    # calibration: activation scales from ONE preprocessed canvas batch of
    # this corpus, then the timed graph runs every conv on the int8 MXU.
    quant = (precision or os.environ.get("BENCH_PRECISION")) == "int8"
    if quant:
        from ifcb_classifier_tpu.models import quant as Q
        assert Q.supports_quant(model_name), \
            f"BENCH_PRECISION=int8 unsupported for {model_name!r}"
        assert folded, "int8 builds on the folded graph (unset BENCH_FOLD=0)"
        calib_x = jax.jit(lambda c, s: preprocess_batch(
            c, s, out_size=out_size,
            dtype=jnp.float32))(*dev_chunks[0][:2])
        params, predict_q = Q.build_quant_predict(model, params,
                                                  batch_stats, calib_x)

        @jax.jit
        def run_batch(params, stats, canvas, sizes, acc):  # noqa: F811
            x = preprocess_batch(canvas, sizes, out_size=out_size,
                                 dtype=jnp.float32)
            probs = predict_q(params, stats, x)
            return probs, acc + jnp.sum(probs)

    # compile via lower() so XLA's FLOP count is available for MFU
    acc0 = jnp.zeros((), jnp.float32)
    compiled = run_batch.lower(params, batch_stats,
                               *dev_chunks[0][:2], acc0).compile()
    batch_flops = _xla_flops(compiled)
    probs, acc = compiled(params, batch_stats, *dev_chunks[0][:2], acc0)
    _ = float(acc)

    n_trials = n_trials or int(os.environ.get("BENCH_TRIALS", "5"))
    n_warm = int(os.environ.get("BENCH_WARMUP_TRIALS", "2"))
    entered_exhausted = _budget_left() <= 0
    if entered_exhausted:
        # budget already spent before this loop: skip the designated
        # warmups and run exactly one counted trial (the break below only
        # fires past n_warm+1 trials — entering warm would overshoot the
        # budget by several full 95-207 s trials)
        n_warm = 0
    trials, call_rates = [], []
    for _t in range(n_trials + n_warm):  # leading designated warmups
        acc = jnp.zeros((), jnp.float32)
        done = 0
        t0 = time.perf_counter()
        for canvas, sizes, n in dev_chunks:
            probs, acc = compiled(params, batch_stats, canvas, sizes, acc)
            done += n
        _ = float(acc)  # forces the whole dependency chain
        dt = time.perf_counter() - t0
        trials.append(done / dt)
        call_rates.append(len(dev_chunks) / dt)
        if _budget_left() <= 0 and len(trials) >= n_warm + 1:
            print(f"bench_infer: wall budget exhausted after "
                  f"{len(trials)} trials", file=sys.stderr)
            break
    # leading trials over the axon tunnel are reliably cold outliers
    # (VERDICT r3 weak #2): report them, exclude them from the statistics
    warmup, trials = trials[:n_warm], trials[n_warm:]
    call_rates = call_rates[n_warm:]
    ips = statistics.median(trials)
    payload = {
        "metric": "raw_bin_inference_imgs_per_sec_per_chip",
        "value": round(ips, 2), "unit": "images/sec/chip",
        "host_pack_imgs_per_sec": round(pack_rate, 0),
        "model": model_name,
        "bn_folded": folded,
        "precision": "int8" if quant else "bf16",
        "warmup_trials": [round(w, 1) for w in warmup],
        "trials": [round(t, 1) for t in trials],
        # a 1-trial spread of 0.0 reads as "perfectly stable" — null it
        # (like iqr_pct) and lean on budget_truncated for context
        "spread_pct": (round(100.0 * (max(trials) - min(trials)) / ips, 2)
                       if len(trials) >= 2 else None),
        "iqr_pct": _iqr_pct(trials, ips),
        # the reference anchor is inception_v3 — a cross-model ratio would
        # be meaningless, so alternate BENCH_MODELs report null
        "vs_baseline": (_vs_baseline(
            ips, "ref_gpu_estimate_infer_imgs_per_sec",
            "infer_imgs_per_sec") if model_name == "inception_v3"
            else None)}
    if len(trials) < n_trials or entered_exhausted:
        # entered_exhausted matters even when len(trials) == n_trials
        # (n_trials=1): a warmup-skipped single trial is a cold outlier
        # and must never read as a clean full run
        payload["budget_truncated"] = True
        payload["trials_requested"] = n_trials
    if batch_flops:
        payload["flops_per_img"] = round(batch_flops / B / 1e9, 2)  # GF
        # MFU from actual compiled CALLS, not real-ROI count: the final
        # chunk pads to B and burns B images of FLOPs regardless, so
        # ips/B under-reports whenever BENCH_ROIS % BENCH_BATCH != 0
        payload.update(_mfu_fields(batch_flops,
                                   statistics.median(call_rates),
                                   peak_scale=2 if quant else 1))
    return payload


def bench_train():
    """Headline mode: inception_v3 @299 bf16 train step throughput.
    Returns the payload dict (main() prints it, ledger fields appended)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.state import create_train_state, make_train_step
    from ifcb_classifier_tpu.utils.config import enable_compile_cache

    enable_compile_cache()

    BATCH = int(os.environ.get("BENCH_BATCH", "128"))
    # BENCH_MODEL=resnet50 etc. benches an alternate flagship; the headline
    # metric stays inception_v3 (the reference's default backbone)
    model_name = os.environ.get("BENCH_MODEL", "inception_v3")
    from ifcb_classifier_tpu.models import input_size_for
    size = int(os.environ.get("BENCH_SIZE", 0)) or input_size_for(model_name)
    model = get_namebrand_model(model_name, 50, dtype=jnp.bfloat16)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), size)
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)

    rng = np.random.RandomState(0)
    batch = dict(images=jnp.asarray(rng.rand(BATCH, size, size, 3), jnp.float32),
                 labels=jnp.asarray(rng.randint(0, 50, BATCH), jnp.int32),
                 mask=jnp.ones((BATCH,), bool))

    # compile once via lower() so XLA's own FLOP count is available for MFU
    compiled = step.lower(state, batch, jax.random.PRNGKey(0)).compile()
    step_flops = _xla_flops(compiled)

    # warmup (2 steps: the first post-donation step also differs)
    for i in range(2):
        state, loss = compiled(state, batch, jax.random.PRNGKey(i))
    _ = float(loss)

    # NOTE: through the axon tunnel, block_until_ready() alone over-reports
    # throughput (async completion signals are unreliable on this
    # experimental platform) — force REAL device->host fetches of the loss
    # and a param checksum so timing covers the whole dependency chain.
    iters = int(os.environ.get("BENCH_ITERS", "50"))
    n_trials = int(os.environ.get("BENCH_TRIALS", "5"))
    n_warm = int(os.environ.get("BENCH_WARMUP_TRIALS", "2"))
    entered_exhausted = _budget_left() <= 0
    if entered_exhausted:
        # budget already spent: skip designated warmups, one counted trial
        # (see bench_infer — same overshoot hazard)
        n_warm = 0
    trials = []
    for _t in range(n_trials + n_warm):  # leading designated warmups
        t0 = time.perf_counter()
        for i in range(iters):
            state, loss = compiled(state, batch, jax.random.PRNGKey(i))
        _ = float(loss)
        # param checksum forces a real device fetch; first leaf —
        # model-agnostic (efficientnet etc. have no "fc" head)
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        _ = float(jnp.sum(jnp.abs(leaf).astype(jnp.float32)))
        dt = time.perf_counter() - t0
        trials.append(BATCH * iters / dt)
        if _budget_left() <= 0 and len(trials) >= n_warm + 1:
            print(f"bench_train: wall budget exhausted after "
                  f"{len(trials)} trials", file=sys.stderr)
            break

    # leading trials over the axon tunnel are reliably cold outliers
    # (VERDICT r3 weak #2): report them, exclude them from the statistics
    warmup, trials = trials[:n_warm], trials[n_warm:]
    imgs_per_sec = statistics.median(trials)
    # null (not 0.0) with a single counted trial — see bench_infer
    spread_pct = (round(100.0 * (max(trials) - min(trials)) / imgs_per_sec, 2)
                  if len(trials) >= 2 else None)
    vs_baseline = _vs_baseline(imgs_per_sec, "ref_gpu_estimate_imgs_per_sec",
                               "imgs_per_sec")
    payload = {
        "metric": f"{model_name}_{size}_bf16_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 2),
        "warmup_trials": [round(w, 1) for w in warmup],
        "trials": [round(t, 1) for t in trials],
        "iters_per_trial": iters,
        "batch": BATCH,
        "spread_pct": spread_pct,
        "iqr_pct": _iqr_pct(trials, imgs_per_sec),
    }
    if len(trials) < n_trials or entered_exhausted:
        # see bench_infer: a warmup-skipped run is truncated even at the
        # full trial count
        payload["budget_truncated"] = True
        payload["trials_requested"] = n_trials
    if step_flops:
        payload["xla_flops_per_step"] = step_flops
        payload["flops_per_img"] = round(step_flops / BATCH / 1e9, 2)  # GF
        payload.update(_mfu_fields(step_flops, imgs_per_sec / BATCH))
        # live HBM-roofline per-chip ceiling for THIS compiled step (the
        # tools/roofline.py method: XLA post-fusion cost analysis; "bytes
        # accessed" over-counts VMEM-resident reuse, so the ceiling is
        # optimistic — measured/ceiling near 1.0 means HBM-roofline-closed)
        step_bytes = _xla_cost(compiled, "bytes accessed")
        peak_f, peak_b = _peak_flops(), _hbm_bytes_per_sec()
        if step_bytes and peak_f and peak_b:
            t_bound = max(step_flops / peak_f, step_bytes / peak_b)
            ceiling = BATCH / t_bound
            payload["roofline_ceiling_imgs_per_sec"] = round(ceiling, 0)
            payload["roofline_bound"] = (
                "hbm" if step_bytes / peak_b > step_flops / peak_f
                else "mxu")
            payload["pct_of_roofline_ceiling"] = round(
                100.0 * imgs_per_sec / ceiling, 1)
    return payload


# Era anchors for the perf ledger (BASELINE.md "Reference-GPU anchor":
# public-era inception_v3 @299 fp32 torch benchmarks; vs_baseline uses the
# conservative V100 upper bound).
_ANCHORS_TRAIN = {"k80": 55.0, "p100": 195.0, "v100": 390.0}
_ANCHORS_INFER = {"v100": 1400.0}


def _ledger(payload):
    """VERDICT r3 'next' #2: settle the >=10x question inside the driver
    artifact. Benches the two RUN product inference tiers (bf16-folded and
    int8-resident) and embeds them, the anchor provenance, and per-era
    ratios alongside the train headline.

    FAIL-SOFT: an infer tier that dies (transient tunnel error, OOM) must
    not take the whole driver artifact with it — the train headline and
    the other tier still print; the dead tier's fields carry the error."""
    import traceback

    def tier(precision):
        if _budget_left() <= 0:
            print(f"ledger: skipping {precision} tier (wall budget spent)",
                  file=sys.stderr)
            return {"value": None,
                    "error": "skipped: BENCH_WALL_BUDGET_S exhausted "
                             "before this tier (slow tunnel)"}
        try:
            return bench_infer(
                precision=precision,
                n_trials=int(os.environ.get("BENCH_LEDGER_TRIALS", "3")))
        except Exception as e:  # noqa: BLE001 — artifact survival
            traceback.print_exc(file=sys.stderr)
            return {"value": None, "error": f"{type(e).__name__}: {e}"}

    # int8 FIRST: it is the deployment tier, so under a starved wall
    # budget it must be the one that survives (VERDICT r4 #6)
    int8 = tier("int8")
    bf16 = tier("bf16")
    train_ips = payload["value"]
    out = {
        "infer_bf16_imgs_per_sec": bf16["value"],
        "infer_int8_imgs_per_sec": int8["value"],
        "infer_bf16_mfu_pct": bf16.get("mfu_pct"),
        "infer_int8_mfu_pct": int8.get("mfu_pct"),
        "anchor": ("reference GPU est., inception_v3 @299 fp32 torch: "
                   "train K80 55 / P100 195 / V100 390 img/s, infer V100 "
                   "1400 img/s — provenance BASELINE.md 'Reference-GPU "
                   "anchor'; vs_baseline uses the conservative V100 bound"),
        "train_vs_anchor": {k: round(train_ips / v, 2)
                            for k, v in _ANCHORS_TRAIN.items()},
    }
    for name, t in (("bf16", bf16), ("int8", int8)):
        if t["value"] is not None:
            out[f"infer_{name}_vs_v100"] = round(
                t["value"] / _ANCHORS_INFER["v100"], 2)
        else:
            out[f"infer_{name}_error"] = t["error"]
    # the verdict is DERIVED from the measured fields beside it (the
    # round-4 review caught the hardcoded version asserting '>=10x met vs
    # K80' even if a regression dropped throughput): a stale adjudication
    # in the one artifact meant to settle the perf question is worse than
    # none. Full anchor-by-anchor reasoning stays in BASELINE.md.
    met = sorted(k for k, r in out["train_vs_anchor"].items() if r >= 10)
    unmet = sorted(k for k, r in out["train_vs_anchor"].items() if r < 10)
    parts = ["train: >=10x {} vs {{{}}}".format(
        "met" if met else "NOT met", ", ".join(met or unmet))]
    if met and unmet:
        parts.append("not vs {{{}}} per-chip".format(", ".join(unmet)))
    pct = payload.get("pct_of_roofline_ceiling")
    parts.append("measured at {}% of the HBM roofline ceiling".format(pct)
                 if pct is not None else
                 "roofline ceiling unavailable this run")
    r8 = out.get("infer_int8_vs_v100")
    if r8 is not None:
        int8_word = "{}x V100".format(r8)
    elif str(int8.get("error", "")).startswith("skipped:"):
        # a deliberate time-budget skip is not a failure — conflating them
        # on the one-line adjudication surface misreads a slow-tunnel day
        # as a regression (ADVICE r4)
        int8_word = "skipped (wall budget)"
    else:
        int8_word = "FAILED this run"
    parts.append("infer int8-resident (deployment tier) " + int8_word)
    verdict = "; ".join(parts) + " — BASELINE.md 'Perf ledger' adjudicates."
    # cross-round artifact comparison must never silently mix full and
    # truncated ledgers: flag the verdict string itself (VERDICT r4 #6)
    degraded = (payload.get("budget_truncated")
                or any(str(t.get("error", "")).startswith("skipped:")
                       or t.get("budget_truncated")
                       for t in (bf16, int8)))
    if degraded:
        verdict = "DEGRADED (wall budget): " + verdict
    out["perf_verdict"] = verdict
    return out


def _last_measured():
    """Newest BENCH_r*.json with a numeric value — context for fail-soft."""
    import glob
    import re
    best = None
    here = os.path.dirname(os.path.abspath(__file__))
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        try:
            with open(p) as f:
                parsed = json.load(f).get("parsed") or {}
        except Exception:
            continue
        if parsed.get("value"):
            best = {"round": int(m.group(1)),
                    "value": parsed["value"],
                    "metric": parsed.get("metric"),
                    "vs_baseline": parsed.get("vs_baseline")}
    return best


def _tpu_unavailable_payload(err):
    infer = os.environ.get("BENCH_MODE") == "infer"
    payload = {
        "metric": ("raw_bin_inference_imgs_per_sec_per_chip" if infer
                   else "inception_v3_299_bf16_train_imgs_per_sec_per_chip"),
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "error": "TPU unavailable: " + err,
    }
    last = _last_measured()
    if last:
        payload["last_measured"] = last  # prior-round context, NOT a claim
    return payload


def _backend_watchdog():
    """Don't let a downed tunnel void the round's bench artifact.

    The driver runs this file on the real chip at round end; a downed axon
    tunnel makes the first backend touch (jax.devices()) block on the
    tunnel claim for ~40 min before erroring (CLAUDE.md), so a hang here
    would time out the driver and record NOTHING. Probe backend init on a
    daemon thread with a deadline; on timeout or error, print an honest
    fail-soft JSON line (value null + the error + the last measured round
    for context) and exit 0 so the line still parses.

    The 2700 s default deliberately outlasts the ~40 min claim-error
    window: a merely BUSY claim (another process holds the tunnel, e.g. a
    queued compile) resolves within it and the real bench still runs; a
    true outage errors out of jax.devices() before the deadline and the
    artifact carries that real error. BENCH_DEVICE_TIMEOUT_S overrides;
    <= 0 disables. os._exit (not sys.exit): a hung backend init may have
    spawned non-daemon threads that would block interpreter teardown."""
    timeout_s = float(os.environ.get("BENCH_DEVICE_TIMEOUT_S", "2700"))
    if timeout_s <= 0:
        return
    import threading
    res = {}

    def probe():
        try:
            import jax
            res["kind"] = jax.devices()[0].device_kind
        except Exception as e:  # noqa: BLE001 — reported in the artifact
            res["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "kind" in res:
        return
    err = res.get("error") or (
        f"backend init exceeded {timeout_s:.0f}s waiting on the tunnel "
        f"claim (pool busy or down; outages error after ~40 min, so past "
        f"the default deadline a hang means sustained unavailability)")
    print(json.dumps(_tpu_unavailable_payload(err)))
    sys.stdout.flush()
    os._exit(0)


def main():
    _backend_watchdog()
    # devices are confirmed live — re-anchor the wall budget so it bounds
    # the measurement phase only, not the (up to 2700 s) claim wait the
    # watchdog just sat through (ADVICE r4: with an import-time anchor, a
    # busy-but-recovering claim exhausted the budget before any trial)
    global _BENCH_T0
    _BENCH_T0 = time.monotonic()
    if os.environ.get("BENCH_MODE") == "infer":
        print(json.dumps(bench_infer()))
        return
    payload = bench_train()
    if os.environ.get("BENCH_LEDGER", "1") != "0":
        payload.update(_ledger(payload))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
