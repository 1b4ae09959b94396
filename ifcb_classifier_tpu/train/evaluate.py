"""VAL verb: offline evaluation of a saved model on a labeled dataset.

Beyond-reference addition (QUIRKS.md "Additions"): the reference can only
measure accuracy DURING training — its validation metrics/result files are
a side effect of TRAIN (`neuston_callbacks.py:20-156` fire on best epochs),
and RUN emits unlabeled scores only. Evaluating an existing model on a new
labeled set (a fresh season's annotations, a cross-instrument check, an
acceptance gate before deployment) required retraining or ad-hoc scripts.

VAL reuses TRAIN's exact validation machinery so its numbers are directly
comparable to epochs.csv / the TRAIN result files:
  * same eval step (`train/state.make_eval_step` — forward + masked
    mean-CE + softmax, validation_step parity, neuston_models.py:94-103),
    with the model rebuilt exactly as the checkpoint describes
    (pretrained/transform_input round-trip) and NO BN folding;
  * same fused on-device preprocess (f32, checkpoint img-norm/resize);
  * same result-file writer and series vocabulary
    (`results/validation.py`, `--results FNAME SERIES...`). The
    training_* series are empty and train_counts_perclass is all-zero —
    there is no training set in an offline evaluation — and
    counts_perclass counts the evaluated set;
  * val_loss is the SUM over batches (the reference's batch-count-
    dependent quirk, kept for comparability with epochs.csv).

Class mapping: the checkpoint's class list defines the output indices.
Every class discovered under SRC (after an optional --class-config merge,
same semantics as TRAIN) must exist in the checkpoint's classes; unknown
classes fail loudly rather than silently mis-scoring. Checkpoint classes
absent from SRC are fine (zero rows, zero counts).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp


def do_validation(args):
    """Evaluate args.MODEL on the labeled folder tree args.SRC."""
    from ..data.datasets import parse_imgnorm, scan_dataset
    from ..data.pipeline import HostLoader, prefetch
    from ..models import get_namebrand_model
    from ..ops.preprocess import preprocess_batch
    from ..results.validation import (DEFAULT_SERIES,
                                      compute_validation_results,
                                      save_validation_results)
    from ..train.checkpoint import load_checkpoint
    from ..train.state import make_eval_step
    from ..utils.config import resolve_dtype

    # single-file output contract (like RUN --type img): in a multi-host
    # fleet only process 0 evaluates — N hosts would do N-fold duplicate
    # inference and then race-write the same result files
    if jax.process_count() > 1 and jax.process_index() != 0:
        print("VAL is single-file output: evaluated by process 0 only; "
              "idle on this host")
        return None

    args.model_id = args.VAL_ID
    os.makedirs(args.outdir, exist_ok=True)
    dtype = resolve_dtype(getattr(args, "precision", None))

    result_files = getattr(args, "result_files", None) or \
        [["val_results.json"]]
    # TRAIN's fail-fast rule (shared validator): a typo'd placeholder or
    # extension must not die — or silently no-op — AFTER inference
    from ..results.validation import validate_result_files
    validate_result_files(result_files, sample_epoch="VAL")

    params, batch_stats, hp = load_checkpoint(args.MODEL)
    classes = [str(c) for c in hp["classes"]]
    resize = int(os.environ.get("IFCBNN_RESIZE_OVERRIDE", 0)) or hp["resize"]
    img_norm = hp.get("img_norm")
    mean, std = parse_imgnorm(img_norm) if img_norm else (None, None)

    # labeled dataset: same scan/merge semantics as TRAIN, no split
    # (scan_dataset is the ONE shared flag→dataset mapping)
    print("Scanning dataset...")
    nd = scan_dataset(args)
    unknown = [c for c in nd.classes if c not in classes]
    if unknown:
        raise ValueError(
            "VAL: {} class(es) under SRC are not in the checkpoint's class "
            "list: {}. The model cannot score classes it was not trained "
            "on — drop those folders or map them with --class-config "
            "(checkpoint classes: {}).".format(
                len(unknown), unknown[:10], classes[:10]))
    if not nd.images:
        raise ValueError("VAL: no images to evaluate under " + args.SRC)
    remap = np.asarray([classes.index(c) for c in nd.classes], np.int32)
    labels = remap[np.asarray(nd.targets, np.int32)]
    counts = np.zeros(len(classes), np.int64)
    np.add.at(counts, labels, 1)
    print("Evaluating {} images across {} of the checkpoint's {} classes"
          .format(len(nd.images), len(nd.classes), len(classes)))

    with open(os.path.join(args.outdir, "validation_images.list"), "w") as f:
        f.write("\n".join(sorted(nd.images)))

    # model exactly as trained (see InferenceEngine: pretrained round-trips
    # transform_input for torchvision-pretrained inceptions); unfolded BN
    # so metrics match TRAIN's validation bit-for-bit given equal inputs
    model = get_namebrand_model(hp["MODEL"], len(classes),
                                pretrained=bool(hp.get("pretrained")),
                                dtype=dtype)
    raw_eval = make_eval_step(model)

    class _EvalState:  # make_eval_step only reads .params / .batch_stats
        pass

    def fused_eval(params, batch_stats, raw):
        # deterministic eval: no flips (TRAIN applies val flips only under
        # --flip ...+V, an augmentation-of-validation option that has no
        # place in an acceptance measurement)
        st = _EvalState()
        st.params, st.batch_stats = params, batch_stats
        images = preprocess_batch(raw["canvas"], raw["sizes"], None,
                                  out_size=resize, mean=mean, std=std,
                                  dtype=jnp.float32)
        return raw_eval(st, dict(images=images, labels=raw["labels"],
                                 mask=raw["mask"]))

    # weights as jit ARGUMENTS, not closure constants (TRAIN's own eval
    # pattern): closing over them bakes ~100 MB of params into the HLO of
    # every canvas-ladder compile and defeats the persistent compile cache
    # across checkpoints (the graph is identical; only the weights differ)
    eval_step = jax.jit(fused_eval)
    params = jax.device_put(params)
    batch_stats = jax.device_put(batch_stats)

    loader = HostLoader(list(nd.images), [int(x) for x in labels],
                        batch_size=args.batch_size,
                        num_workers=args.loaders, shuffle=False,
                        n_real=len(nd.images))
    losses, probs_l, ns, classes_l, srcs = [], [], [], [], []
    for b in prefetch(iter(loader)):
        loss, probs = eval_step(params, batch_stats,
                                dict(canvas=b["canvas"], sizes=b["sizes"],
                                     labels=np.asarray(b["labels"]),
                                     mask=np.asarray(b["mask"])))
        n = int(b["mask"].sum())
        losses.append(loss)  # device scalars — fetched once below
        probs_l.append(probs)
        ns.append(n)
        classes_l.append(b["labels"][:n])
        srcs.extend(loader.items[i] for i in b["indices"][:n])
    losses = jax.device_get(losses)
    probs = np.concatenate([p[:n] for p, n in
                            zip(jax.device_get(probs_l), ns)])
    input_classes = np.concatenate(classes_l)
    val_loss = float(np.sum(losses, dtype=np.float64))

    results = None
    for rf in result_files:
        fname, series = rf[0], rf[1:]
        results = compute_validation_results(
            series or DEFAULT_SERIES,
            class_labels=classes,
            input_classes=input_classes, output_scores=probs,
            image_fullpaths=srcs, model_id=args.model_id,
            timestamp=args.cmd_timestamp,
            counts_perclass=[int(c) for c in counts],
            val_counts_perclass=[int(c) for c in counts],
            train_counts_perclass=[0] * len(classes),
            training_image_fullpaths=[], training_classes=[])
        outfile = os.path.join(args.outdir, fname).format(epoch="VAL")
        os.makedirs(os.path.dirname(outfile) or ".", exist_ok=True)
        save_validation_results(outfile, results)
        print("Saved", outfile)

    from sklearn.metrics import f1_score
    # sklearn's DEFAULT labels basis (classes present in y_true/y_pred),
    # exactly like TRAIN's epochs.csv f1 (train/loop.py): a fixed
    # range(len(classes)) basis would count every checkpoint class absent
    # from SRC as 0.0 and silently deflate the macro average — VAL's
    # whole contract is comparability with TRAIN's numbers
    f1_w = f1_score(input_classes, np.argmax(probs, 1), average="weighted")
    f1_m = f1_score(input_classes, np.argmax(probs, 1), average="macro")
    print("VAL: {} images, val_loss={:.3f}, val_f1_w={:.1%}, "
          "val_f1_m={:.1%}".format(len(srcs), val_loss, f1_w, f1_m))

    if getattr(args, "args_log", None):
        from ..utils.config import dump_args_yml
        dump_args_yml(args, os.path.join(args.outdir, args.args_log))
    # (the CLI prints the reference's final "DONE!" after main() returns)
    return dict(val_loss=val_loss, f1_weighted=float(f1_w),
                f1_macro=float(f1_m), n_images=len(srcs))
