"""Turnkey accuracy-parity harness (VERDICT round-1 #7).

One command runs the whole chain the moment real artifacts exist:

  torch .pth  --PORT_WEIGHTS-->  .npz  --TRAIN --weights-->  .ptl
      --RUN on bins-->  result files  --COMPARE-->  parity report

Real-artifact usage (a torchvision state_dict + an IFCB bin directory,
optionally result files produced by the reference installation):

  python tools/accuracy_parity.py \
      --weights inception_v3_google.pth --model inception_v3 \
      --train-src /data/folder_per_class --bins /data/bins \
      --reference-results /data/reference_run_output \
      --outdir parity-out --emax 16

Demo mode (no external artifacts; validates the chain end-to-end on the
synthetic corpus from tools/make_demo_corpus.py, with the "reference"
result files produced by a pure-torch model carrying the SAME trained
weights — the strongest offline accuracy-parity evidence available in a
zero-egress environment):

  python tools/accuracy_parity.py --demo --outdir parity-out

Exit code 0 iff top-1 agreement ≥ --min-agreement (default 99.5%, the
±0.5% BASELINE.json target).
"""

import argparse
import glob
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def sh(*cmd, env=None):
    print("+", " ".join(map(str, cmd)), flush=True)
    subprocess.run(list(map(str, cmd)), check=True, env=env)


def load_result_file(path):
    """Read a v3 run-result file (.h5 or .json) → dict(bin_id, roi_numbers,
    scores [N,C], class_labels). Formats per results/run.py (reference
    neuston_callbacks.py:160-272)."""
    if path.endswith(".h5"):
        import h5py
        with h5py.File(path, "r") as f:
            meta = f["metadata"]
            return dict(
                bin_id=meta.attrs["bin_id"] if "bin_id" in meta.attrs else
                os.path.basename(path).replace("_class.h5", ""),
                roi_numbers=np.asarray(f["roi_numbers"], np.int64),
                scores=np.asarray(f["output_scores"], np.float32),
                class_labels=[c.decode() if isinstance(c, bytes) else str(c)
                              for c in f["class_labels"][()]])
    if path.endswith(".json"):
        with open(path) as f:
            d = json.load(f)
        rois = [int(str(p).rsplit("_", 1)[-1]) for p in d["input_images"]]
        return dict(bin_id=d.get("bin_id", os.path.basename(path)),
                    roi_numbers=np.asarray(rois, np.int64),
                    scores=np.asarray(d["output_scores"], np.float32),
                    class_labels=list(d["class_labels"]))
    raise ValueError(f"unsupported result file: {path}")


def collect_results(outdir):
    files = sorted(glob.glob(os.path.join(outdir, "**", "*_class.h5"),
                             recursive=True)) or \
        sorted(glob.glob(os.path.join(outdir, "**", "*.json"),
                         recursive=True))
    assert files, f"no result files under {outdir}"
    out = {}
    for p in files:
        r = load_result_file(p)
        out[str(r["bin_id"]).split(os.sep)[-1]] = r
    return out


def compare(ours: dict, ref: dict, min_agreement: float):
    """Per-(bin, roi) score/argmax comparison; returns (report, ok)."""
    bins = sorted(set(ours) & set(ref))
    missing = sorted(set(ref) - set(ours))
    n, agree, mae, worst = 0, 0, 0.0, 0.0
    rois_missing = 0
    y_ref, y_ours = [], []
    for b in bins:
        o, r = ours[b], ref[b]
        assert o["class_labels"] == r["class_labels"], \
            f"class label sets differ for {b}"
        rois = sorted(set(o["roi_numbers"]) & set(r["roi_numbers"]))
        # ROI-level coverage gates too: a regression that DROPS rows from
        # our results would otherwise shrink the intersection and PASS on
        # whatever survived — the exact failure this harness exists to catch
        rois_missing += len(set(r["roi_numbers"]) - set(o["roi_numbers"]))
        oi = {t: k for k, t in enumerate(o["roi_numbers"])}
        ri = {t: k for k, t in enumerate(r["roi_numbers"])}
        for t in rois:
            so, sr = o["scores"][oi[t]], r["scores"][ri[t]]
            d = np.abs(so.astype(np.float32) - sr.astype(np.float32))
            mae += float(d.mean())
            worst = max(worst, float(d.max()))
            ao, ar = int(so.argmax()), int(sr.argmax())
            y_ours.append(ao)
            y_ref.append(ar)
            agree += ao == ar
            n += 1
    from sklearn import metrics as m
    f1_ours_vs_ref = m.f1_score(y_ref, y_ours, average="weighted") if n else 0
    report = dict(
        bins_compared=len(bins), bins_missing_from_ours=missing,
        rois_compared=n, rois_missing_from_ours=rois_missing,
        top1_agreement=round(agree / max(n, 1), 5),
        score_mae=round(mae / max(n, 1), 6),
        score_max_abs_delta=round(worst, 6),
        weighted_f1_vs_reference_labels=round(float(f1_ours_vs_ref), 5))
    ok = (n > 0 and not missing and rois_missing == 0
          and report["top1_agreement"] >= min_agreement)
    return report, ok


def _torch_twin(model_name, n_classes, transform_input=False):
    """The pure-torch (torchvision-layout) twin for a model family — every
    zoo family, via the first-party torch zoo the .onnx exporter traces
    (models/torch_zoo.py)."""
    from ifcb_classifier_tpu.models.torch_zoo import build_torch_model
    return build_torch_model(model_name, n_classes,
                             transform_input=transform_input)


def demo_reference_results(ckpt, bins_dir, ref_outdir, timestamp):
    """Produce 'reference' result files: a pure-torch model loaded with the
    SAME trained weights classifies the same bins with reference-style PIL
    preprocessing (Resize → ToTensor → Normalize when the checkpoint was
    trained with --img-norm, neuston_data.py:456-464), written in the
    reference v3 h5 format."""
    import torch
    from PIL import Image

    from ifcb_classifier_tpu.data.datasets import parse_imgnorm
    from ifcb_classifier_tpu.data.ifcb import (SCHEMA_VERSION_1,
                                               DataDirectory,
                                               infilled_images)
    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.models.torch_port import export_state_dict
    from ifcb_classifier_tpu.results.run import save_run_results
    from ifcb_classifier_tpu.train.checkpoint import load_checkpoint

    params, stats, hparams = load_checkpoint(ckpt)
    classes, resize = hparams["classes"], hparams["resize"]
    model_name = hparams["MODEL"]
    norm = (parse_imgnorm(hparams["img_norm"])
            if hparams.get("img_norm") else None)
    sd = export_state_dict(model_name, params, stats)
    # pretrained inceptions carry transform_input=True into inference
    # (torchvision factory rule; mirrored by InferenceEngine)
    tm = _torch_twin(model_name, len(classes),
                     transform_input=(model_name == "inception_v3"
                                      and bool(hparams.get("pretrained"))))
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}, strict=False)
    tm.eval()

    for bin in DataDirectory(bins_dir):
        rel = os.path.dirname(bin.fileset.basepath.replace(bins_dir, ""))
        bin.pid.namespace = rel + os.sep if rel else ""
        images, targets = [], []
        # schema-v1 bins serve STITCHED composites, exactly like RUN
        # (infer/runner.py predict_bin) and the reference's InfilledImages
        # wrap (neuston_data.py:446-449) — raw bin.images rows would
        # compare a first-sub-ROI against our stitched frame
        imgs = (infilled_images(bin) if bin.schema == SCHEMA_VERSION_1
                else bin.images)
        for t, roi in imgs.items():
            im = Image.fromarray(roi, "L").convert("RGB").resize(
                (resize, resize), Image.BILINEAR)
            arr = np.asarray(im, np.float32) / 255.0
            if norm is not None:  # torchvision Normalize semantics
                mean, std = norm
                arr = (arr - np.asarray(mean, np.float32)) / \
                    np.asarray(std, np.float32)
            images.append(arr)
            targets.append(t)
        if not images:
            continue
        x = torch.from_numpy(np.stack(images).transpose(0, 3, 1, 2))
        with torch.no_grad():
            out = tm(x)
            if isinstance(out, tuple):
                out = out[0]
            probs = torch.softmax(out, 1).numpy()
        inputs = [bin.pid.with_target(t) for t in targets]
        save_run_results(inputs, probs, classes, timestamp, ref_outdir,
                         "D{BIN_YEAR}/D{BIN_DATE}/{BIN_ID}_class.h5",
                         "torch-reference", bin.pid)
    print(f"reference (pure-torch) results at {ref_outdir}")


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--demo", action="store_true",
                    help="synthetic end-to-end validation, no artifacts needed")
    ap.add_argument("--demo-flagship", action="store_true",
                    help="--demo with the FLAGSHIP config: inception_v3 @299 "
                         "+ --img-norm + --flip xy + a class-config CSV, so "
                         "the full preprocessing/aux-loss chain is covered "
                         "end-to-end (neuston_data.py:342-371 + "
                         "neuston_models.py:70-78)")
    ap.add_argument("--demo-model", default=None, metavar="FAMILY",
                    help="--demo with an arbitrary zoo family (e.g. "
                         "resnet50, whose int8-resident graph changes the "
                         "shortcut quantization point — gate it with "
                         "--int8)")
    ap.add_argument("--weights", help="torch state_dict .pth/.npz")
    ap.add_argument("--model", default="inception_v3")
    ap.add_argument("--train-src", help="folder-per-class training dir")
    ap.add_argument("--bins", help="raw IFCB bin directory")
    ap.add_argument("--img-norm", nargs=2, metavar=("MEAN", "STD"),
                    help="forwarded to TRAIN (and mirrored by the torch "
                         "reference preprocessing in demo mode)")
    ap.add_argument("--flip", default=None,
                    help="forwarded to TRAIN (training-time augmentation)")
    ap.add_argument("--class-config", nargs=2, metavar=("CSV", "COL"),
                    help="forwarded to TRAIN")
    ap.add_argument("--reference-results",
                    help="directory of reference-produced result files "
                         "(h5/json); omit to just produce ours")
    ap.add_argument("--outdir", default="parity-out")
    ap.add_argument("--emax", type=int, default=None,
                    help="TRAIN epochs (default 10; demo modes default 2)")
    ap.add_argument("--batch", type=int, default=None,
                    help="batch size (default 108; demo modes default 16)")
    ap.add_argument("--seed", type=int, default=61)
    ap.add_argument("--min-agreement", type=float, default=0.995,
                    help="top-1 agreement gate (0.995 = the ±0.5%% target)")
    ap.add_argument("--int8", action="store_true",
                    help="also RUN the int8 quantized tier (models/quant.py)"
                         " on the same bins and gate ITS top-1 agreement "
                         "against the reference — the deployment-accuracy "
                         "evidence for RUN --precision int8")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    py = sys.executable

    if args.demo or args.demo_flagship or args.demo_model:
        args.model = ("inception_v3" if args.demo_flagship
                      else args.demo_model or "resnet18")
        # demo-sized defaults, but an explicit --emax/--batch wins (e.g. a
        # better-trained demo model when agreement is borderline)
        args.emax = 2 if args.emax is None else args.emax
        args.batch = 16 if args.batch is None else args.batch
        corpus = os.path.join(args.outdir, "corpus")
        if not os.path.isdir(corpus):
            sh(py, os.path.join(REPO, "tools", "make_demo_corpus.py"), corpus,
               "--per-class", 30, "--bins", 3)
        args.train_src = os.path.join(corpus, "training")
        args.bins = os.path.join(corpus, "bins")
        # the "real .pth": a torchvision-keyed pure-torch state_dict
        import torch
        torch.manual_seed(7)
        args.weights = os.path.join(args.outdir, "demo_imagenet.pth")
        torch.save(_torch_twin(args.model, 1000).state_dict(), args.weights)
        if args.demo_flagship:
            # the full preprocessing chain: normalization, training-time
            # flips, and a class-config CSV that both renames AND merges
            args.img_norm = args.img_norm or ["0.45", "0.25"]
            args.flip = args.flip or "xy"
            if not args.class_config:
                cc = os.path.join(args.outdir, "class_config.csv")
                with open(cc, "w") as f:
                    # 'blob' MERGES round+elongated (rename-to-same-label
                    # grouping, neuston_data.py:207-223); spiky stays
                    f.write("class,demo\nround,blob\nelongated,blob\n"
                            "spiky,1\n")
                args.class_config = [cc, "demo"]

    assert args.weights and args.train_src and args.bins, \
        "--weights/--train-src/--bins required (or --demo)"
    args.emax = 10 if args.emax is None else args.emax
    args.batch = 108 if args.batch is None else args.batch

    # 1) PORT_WEIGHTS
    ported = os.path.join(args.outdir, "ported_weights.npz")
    sh(py, "-m", "ifcb_classifier_tpu.util_cli", "PORT_WEIGHTS",
       args.weights, "-o", ported)

    # 2) TRAIN --weights (reference defaults except where overridden)
    train_out = os.path.join(args.outdir, "train")
    cmd = [py, "-m", "ifcb_classifier_tpu", "--batch", args.batch,
           "TRAIN", args.train_src, args.model, "parity",
           "--weights", ported, "--emax", args.emax, "--estop", "0",
           "--seed", args.seed, "--outdir", train_out]
    if args.img_norm:
        cmd += ["--img-norm", *args.img_norm]
    if args.flip:
        cmd += ["--flip", args.flip]
    if args.class_config:
        cmd += ["--class-config", *args.class_config]
    sh(*cmd)
    ckpt = os.path.join(train_out, "parity.ptl")

    # 3) RUN on the bins (fp32: reference-exact inference)
    run_out = os.path.join(args.outdir, "run")
    sh(py, "-m", "ifcb_classifier_tpu", "--batch", args.batch,
       "--precision", "fp32",
       "RUN", args.bins, ckpt, "parity", "--type", "bin",
       "--outdir", run_out, "--clobber")

    # 4) reference results: supplied, or produced by pure-torch in demo mode
    ref_dir = args.reference_results
    if args.demo or args.demo_flagship or args.demo_model:
        ref_dir = os.path.join(args.outdir, "reference")
        demo_reference_results(ckpt, args.bins + os.sep, ref_dir,
                               "2026-01-01T00:00:00+00:00")
    if not ref_dir:
        print("\nNo --reference-results given; our result files are at",
              run_out)
        return

    report, ok = compare(collect_results(run_out), collect_results(ref_dir),
                         args.min_agreement)
    print("\n=== ACCURACY PARITY REPORT ===")
    print(json.dumps(report, indent=2))
    print("PARITY:", "PASS" if ok else "FAIL",
          f"(gate: top-1 agreement >= {args.min_agreement})")

    if args.int8:
        # the quantized tier against the SAME reference results: scores
        # shift at the ~1e-2 level by design (models/quant.py), so the
        # evidence that matters is top-1 agreement through the full CLI
        run_q = os.path.join(args.outdir, "run_int8")
        sh(py, "-m", "ifcb_classifier_tpu", "--batch", args.batch,
           "--precision", "int8",
           "RUN", args.bins, ckpt, "parity", "--type", "bin",
           "--outdir", run_q, "--clobber")
        report_q, ok_q = compare(collect_results(run_q),
                                 collect_results(ref_dir),
                                 args.min_agreement)
        print("\n=== INT8 TIER vs REFERENCE ===")
        print(json.dumps(report_q, indent=2))
        print("INT8 PARITY:", "PASS" if ok_q else "FAIL",
              f"(gate: top-1 agreement >= {args.min_agreement})")
        ok = ok and ok_q

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
