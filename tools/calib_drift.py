"""Measure cross-calibration-bin int8 score drift (VERDICT r4 next #3).

RUN --precision int8 calibrates activation scales lazily on the first
batch unless pinned with --calib DIR. This tool quantifies what that
arrival-order dependence costs: on the demo corpus it calibrates one
pinned engine per bin (N different single-bin calib sources), scores one
shared eval set with each, and reports pairwise max |dP| and argmax-flip
rate — the drift two operationally identical services could exhibit
forever without --calib. It then verifies the pinned fix: two engines
pinned to the SAME source are byte-identical.

    python tools/calib_drift.py --demo --outdir /tmp/drift   # CPU ok
    python tools/calib_drift.py --ckpt M.ptl --bins DIR      # real data

Writes CALIB_DRIFT.json (one JSON line, BASELINE.md "int8 calibration
drift" row) into --outdir. Reference analog: deterministic fp32 eval,
/root/reference/neuston_models.py:152-157 — the reference has no
quantized tier, so this drift axis is ours to bound and document.
"""

import argparse
import glob
import itertools
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo", action="store_true",
                    help="synthesize the demo corpus + train a quick "
                         "resnet18 (no external artifacts needed)")
    ap.add_argument("--ckpt", help="trained .ptl checkpoint (skips --demo "
                                   "training)")
    ap.add_argument("--bins", help="directory of .adc/.roi/.hdr bins to "
                                   "use as calib sources AND eval set")
    ap.add_argument("--outdir", default="calib-drift-out")
    ap.add_argument("--emax", type=int, default=2, help="demo TRAIN epochs")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--eval-count", type=int, default=240,
                    help="max eval ROIs scored by every engine")
    ap.add_argument("--eval-max-dim", type=int, default=64,
                    help="keep only eval ROIs whose max side fits this "
                         "canvas ladder — ONE compiled predict shape per "
                         "engine (each pinned engine's absmax constants "
                         "defeat the compile cache, so shapes are the "
                         "wall-clock driver on a CPU box); 0 = keep all")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (drift is a property of "
                         "the scales, not the chip)")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax  # noqa: F811

    from ifcb_classifier_tpu.utils.config import enable_compile_cache
    enable_compile_cache()

    os.makedirs(args.outdir, exist_ok=True)
    if args.demo:
        corpus = os.path.join(args.outdir, "corpus")
        if not os.path.isdir(os.path.join(corpus, "bins")):
            subprocess.run([sys.executable,
                            os.path.join(REPO, "tools",
                                         "make_demo_corpus.py"), corpus],
                           check=True)
        args.bins = os.path.join(corpus, "bins")
        if not args.ckpt:
            out = os.path.join(args.outdir, "train")
            ckpt = os.path.join(out, "drift.ptl")
            if not os.path.isfile(ckpt):
                env = dict(os.environ)
                if args.cpu:
                    env.update(PALLAS_AXON_POOL_IPS="",
                               JAX_PLATFORMS="cpu")
                subprocess.run(
                    [sys.executable, "-m", "ifcb_classifier_tpu",
                     "--batch", str(args.batch), "TRAIN",
                     os.path.join(corpus, "training"), "resnet18", "drift",
                     "--emax", str(args.emax), "--estop", "0",
                     "--outdir", out, "--seed", "7"],
                    check=True, env=env, cwd=REPO)
            args.ckpt = ckpt
    assert args.ckpt and args.bins, "--ckpt and --bins required (or --demo)"

    from ifcb_classifier_tpu.data.ifcb import (SCHEMA_VERSION_1, Bin,
                                               infilled_images)
    from ifcb_classifier_tpu.infer.runner import InferenceEngine

    adcs = sorted(glob.glob(os.path.join(args.bins, "**", "*.adc"),
                            recursive=True))
    # v2 bins only as calib sources: single-bin directories
    calib_bins = [a for a in adcs if Bin(a).schema != SCHEMA_VERSION_1]
    assert len(calib_bins) >= 2, "need >= 2 v2 bins to measure drift"

    # shared eval set: ROIs pooled round-robin across all bins
    per_bin = []
    for a in adcs:
        b = Bin(a)
        imgs = (infilled_images(b) if b.schema == SCHEMA_VERSION_1
                else b.images)
        per_bin.append(list(imgs.values()))
    eval_imgs = [img for group in itertools.zip_longest(*per_bin)
                 for img in group if img is not None]
    if args.eval_max_dim:
        kept = [im for im in eval_imgs
                if max(im.shape[:2]) <= args.eval_max_dim]
        assert kept, (
            f"--eval-max-dim {args.eval_max_dim} filtered out ALL "
            f"{len(eval_imgs)} eval ROIs (real IFCB ROIs routinely exceed "
            f"64 px) — raise it or pass --eval-max-dim 0 to keep every "
            f"ladder (more compiles per engine)")
        eval_imgs = kept
    eval_imgs = eval_imgs[:args.eval_count]
    assert eval_imgs, f"no eval ROIs found under {args.bins}"
    print(f"eval set: {len(eval_imgs)} ROIs from {len(adcs)} bins; "
          f"{len(calib_bins)} calib sources; backend "
          f"{jax.default_backend()}")

    def single_bin_dir(adc):
        d = os.path.join(args.outdir, "calib",
                         os.path.splitext(os.path.basename(adc))[0])
        if not os.path.isdir(d):
            os.makedirs(d)
            base = os.path.splitext(adc)[0]
            for ext in (".adc", ".roi", ".hdr"):
                if os.path.isfile(base + ext):
                    shutil.copy(base + ext, d)
        return d

    # batch_ladder=False: one compiled dispatch shape per engine (ladder
    # buckets would each pay a fresh compile per engine — absmax constants
    # make every pinned engine's graphs cache-unique)
    scores, names = [], []
    for adc in calib_bins:
        d = single_bin_dir(adc)
        eng = InferenceEngine(args.ckpt, batch_size=args.batch, quant=True,
                              calib_src=d, batch_ladder=False)
        scores.append(eng.predict_images(eval_imgs))
        names.append(os.path.basename(d))
        print(f"  calibrated on {names[-1]}", flush=True)

    n = len(eval_imgs)
    pair_stats = []
    for i in range(len(scores)):
        for j in range(i + 1, len(scores)):
            d = float(np.abs(scores[i] - scores[j]).max())
            flips = int((scores[i].argmax(-1)
                         != scores[j].argmax(-1)).sum())
            pair_stats.append(dict(a=names[i], b=names[j],
                                   max_abs_dscore=round(d, 6),
                                   argmax_flips=flips))
    worst = max(p["max_abs_dscore"] for p in pair_stats)
    total_flips = sum(p["argmax_flips"] for p in pair_stats)

    # the pinned guarantee: same source twice => byte-identical
    d0 = single_bin_dir(calib_bins[0])
    rep = InferenceEngine(args.ckpt, batch_size=args.batch, quant=True,
                          calib_src=d0,
                          batch_ladder=False).predict_images(eval_imgs)
    pinned_identical = bool((rep == scores[0]).all())

    from ifcb_classifier_tpu.train.checkpoint import load_checkpoint
    payload = dict(
        metric="int8_cross_calibration_bin_drift",
        model=load_checkpoint(args.ckpt)[2]["MODEL"],
        backend=jax.default_backend(),
        n_calib_sources=len(calib_bins), n_eval_rois=n,
        worst_pair_max_abs_dscore=worst,
        argmax_flip_rate=round(total_flips / (n * len(pair_stats)), 6),
        total_argmax_flips=total_flips,
        n_pairs=len(pair_stats),
        pinned_rerun_byte_identical=pinned_identical,
        pairs=pair_stats)
    out = os.path.join(args.outdir, "CALIB_DRIFT.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: v for k, v in payload.items() if k != "pairs"}))
    print("wrote", out)
    assert pinned_identical, \
        "pinned engines must be byte-identical for the same --calib DIR"


if __name__ == "__main__":
    main()
