"""Model export + exported-model inference — the ONNX sidecar's role
(/root/reference/neuston_onnx.py) in TPU-native form.

EXPORT: checkpoint → serialized StableHLO artifact (jax.export) + newline-
        delimited .classes file (the reference's .onnx + .classes contract,
        neuston_onnx.py:44-65). Supports fixed or dynamic ("poly") batch and
        fp32/bf16 ("--half" analog).
RUN:    artifact (or raw checkpoint) over an image folder/.txt/single image
        → softmax → argmax + labels printed (neuston_onnx.py:68-107), but
        batched via the canvas pipeline instead of one giant array
        (the reference materializes the entire dataset unbatched, :85-86 —
        a known quirk we deliberately fix).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_calib_batch(calib_src: str, resize: int, mean, std, n: int):
    """One preprocessed calibration batch from a user-supplied sample of
    deployment data: a bin directory (.adc/.roi/.hdr filesets) or an image
    folder/.txt list. Returns [n, resize, resize, 3] float32 — the same
    tensor the int8 engine calibrates on at its first dispatch
    (infer/runner.py:_calibrate)."""
    import glob as _glob

    from .data.pipeline import pack_canvas_batch
    from .ops.preprocess import preprocess_batch

    adcs = sorted(_glob.glob(os.path.join(calib_src, "**", "*.adc"),
                             recursive=True))
    if adcs:
        from .data.ifcb import SCHEMA_VERSION_1, Bin, infilled_images
        images = []
        for adc in adcs:
            b = Bin(adc)
            # schema-v1 bins serve STITCHED composites (infer/runner.py
            # predict_bin) — calibrate on the same tensors, not the raw
            # unstitched sub-ROIs
            imgs = (infilled_images(b) if b.schema == SCHEMA_VERSION_1
                    else b.images)
            images.extend(imgs.values())
            if len(images) >= n:
                break
        images = images[:n]
        if not images:
            raise ValueError(f"--calib {calib_src}: no ROIs found in bins")
        canvas, sizes, _ = pack_canvas_batch(images, batch_size=len(images))
    else:
        from .data.datasets import list_image_paths
        from .data.pipeline import HostLoader
        paths = list_image_paths(calib_src)[:n]
        if not paths:
            raise ValueError(f"--calib {calib_src}: no bins or images found")
        batch = next(iter(HostLoader(paths, batch_size=len(paths),
                                     rgb=True)))
        canvas, sizes = batch["canvas"], batch["sizes"]  # no pad rows
    return np.asarray(preprocess_batch(canvas, sizes, out_size=resize,
                                       mean=mean, std=std))


def export_model(ckpt_path: str, output: str | None = None,
                 batchsize: int = 0, half: bool = False,
                 precision: str | None = None, calib: str | None = None,
                 calib_count: int = 128):
    """Serialize the eval forward fn (preprocessed image batch → softmax
    scores) as StableHLO bytes + sidecar .classes/.json metadata.

    precision='int8' bakes the post-training-quantized graph
    (models/quant.py — the RUN --precision int8 tier) into the artifact:
    activation scales are calibrated ONCE here on `calib` (a sample of
    deployment bins/images, required) and frozen as constants, so the
    deployed artifact needs no lazy calibration pass."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from .models import get_namebrand_model
    from .train.checkpoint import load_checkpoint
    from .train.state import make_predict_step

    params, batch_stats, hparams = load_checkpoint(ckpt_path)
    classes = hparams["classes"]
    resize = hparams["resize"]
    quant = precision == "int8"
    dtype = jnp.bfloat16 if (half or quant) else jnp.float32
    # pretrained round-trips from the checkpoint: torchvision semantics make
    # inception's transform_input a model attribute that applies at
    # inference too (see InferenceEngine for the same rule)
    # BN→conv folding (models/fold.py): same default as InferenceEngine —
    # the exported artifact bakes the folded graph in (+18% measured on the
    # inception deployment path); IFCBNN_NO_FOLD=1 exports unfolded.
    from .models.fold import fold_params, supports_fold
    folded = (supports_fold(hparams["MODEL"])
              and os.environ.get("IFCBNN_NO_FOLD") != "1")
    if folded:
        params, batch_stats = fold_params(hparams["MODEL"], params,
                                          batch_stats)
    model = get_namebrand_model(hparams["MODEL"], len(classes),
                                pretrained=bool(hparams.get("pretrained")),
                                dtype=dtype, fold_bn=folded)
    if quant:
        from .models.quant import build_quant_predict, supports_quant
        if not supports_quant(hparams["MODEL"]) or not folded:
            raise ValueError(f"--precision int8 unsupported for "
                             f"{hparams['MODEL']!r} (needs a foldable, "
                             "non-grouped-conv family)")
        if not calib:
            raise ValueError("--precision int8 needs --calib DIR (a sample "
                             "of deployment bins or images to calibrate "
                             "activation scales on)")
        mean, std = (None, None)
        if hparams.get("img_norm"):
            from .data.datasets import parse_imgnorm
            mean, std = parse_imgnorm(hparams["img_norm"])
        calib_x = _load_calib_batch(calib, resize, mean, std, calib_count)
        print(f"calibrating int8 scales on {calib_x.shape[0]} ROIs "
              f"from {calib}")
        params, predict = build_quant_predict(
            model, jax.device_put(params), jax.device_put(batch_stats),
            jnp.asarray(calib_x))
    else:
        predict = make_predict_step(model)

    def fn(images):
        return predict(params, batch_stats, images)

    if batchsize:
        in_shape = jax.ShapeDtypeStruct((batchsize, resize, resize, 3),
                                        jnp.float32)
    else:
        b = jexport.symbolic_shape("b")[0]  # dynamic batch axis
        in_shape = jax.ShapeDtypeStruct((b, resize, resize, 3), jnp.float32)

    exported = jexport.export(jax.jit(fn))(in_shape)
    blob = exported.serialize()

    if not output:
        output = ckpt_path.replace(".ptl", "").replace(".ckpt", "")
        output += (".INT8.stablehlo" if quant
                   else ".FP16.stablehlo" if half else ".stablehlo")
    os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
    with open(output, "wb") as f:
        f.write(blob)
    print("EXPORTED:", output)

    classes_file = output + ".classes"
    with open(classes_file, "w") as f:
        f.write("\n".join(classes))
    print("EXPORTED:", classes_file)

    meta_file = output + ".json"
    with open(meta_file, "w") as f:
        json.dump(dict(model=hparams["MODEL"], resize=resize,
                       img_norm=hparams.get("img_norm"),
                       model_id=hparams.get("model_id"),
                       n_classes=len(classes), bn_folded=folded,
                       precision=("int8" if quant
                                  else "bf16" if half else "fp32"),
                       calib_src=(os.path.abspath(calib) if quant
                                  else None)), f)
    return output


def run_exported(model_path: str, src: str, classfile: str | None = None,
                 batch_size: int = 108):
    """Run a serialized .stablehlo EXPORT artifact over images.

    Raw `.ptl` checkpoints are NOT accepted here — export them first
    (`ifcbnn-export EXPORT model.ptl`); a clear error beats jax.export's
    opaque flatbuffer failure."""
    if model_path.endswith((".ptl", ".ckpt")):
        raise ValueError(
            "{} looks like a raw checkpoint, not an exported artifact — "
            "run `ifcbnn-export EXPORT {}` first".format(model_path,
                                                         model_path))
    import jax.numpy as jnp
    from jax import export as jexport

    from .data.datasets import list_image_paths
    from .data.pipeline import HostLoader, prefetch
    from .ops.preprocess import preprocess_batch

    img_paths = list_image_paths(src)
    assert img_paths, "No images to process"

    with open(model_path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))

    meta = {}
    if os.path.isfile(model_path + ".json"):
        with open(model_path + ".json") as f:
            meta = json.load(f)
    resize = meta.get("resize", 299)  # neuston_onnx.py:84 hardcodes 299
    img_norm = meta.get("img_norm")
    mean, std = (None, None)
    if img_norm:
        from .data.datasets import parse_imgnorm
        mean, std = parse_imgnorm(img_norm)

    loader = HostLoader(img_paths, batch_size=batch_size, rgb=True)
    all_scores, paths = [], []
    for b in prefetch(iter(loader)):
        images = np.asarray(preprocess_batch(b["canvas"], b["sizes"],
                                             out_size=resize, mean=mean,
                                             std=std))
        out = exported.call(jnp.asarray(images))
        n = int(b["mask"].sum())
        all_scores.append(np.asarray(out)[:n])
        paths.extend(loader.items[i] for i in b["indices"][:n])
    scores = np.concatenate(all_scores)
    output_classes = np.argmax(scores, axis=1)
    output_scores = np.max(scores, axis=1)
    print(output_scores)
    print(output_classes)

    classfile = classfile or model_path + ".classes"
    if os.path.isfile(classfile):
        with open(classfile) as f:
            classes = f.read().splitlines()
        print([classes[i] for i in output_classes])
    return scores, paths


def main_cli(argv=None):
    parser = argparse.ArgumentParser(
        prog="ifcbnn-export",
        description="Export trained models to portable StableHLO artifacts "
                    "(the reference's ONNX sidecar role)")
    sub = parser.add_subparsers(dest="cmd_mode")
    exp = sub.add_parser("EXPORT", help="Export a checkpoint to .stablehlo")
    exp.add_argument("MODEL", help="Model checkpoint (.ptl) to convert")
    exp.add_argument("--half", action="store_true",
                     help="Export with bf16 compute (the FP16 analog)")
    exp.add_argument("--precision", choices=["fp32", "bf16", "int8"],
                     default=None,
                     help="int8: bake the calibrated post-training-"
                          "quantized graph into the artifact (needs "
                          "--calib); bf16 = --half; default fp32")
    exp.add_argument("--calib", default=None, metavar="DIR",
                     help="With --precision int8: a sample of deployment "
                          "bins or images to calibrate activation scales "
                          "on (scales freeze into the artifact)")
    exp.add_argument("--calib-count", default=128, type=int,
                     help="Max ROIs/images in the calibration batch")
    exp.add_argument("--batchsize", default=0, type=int,
                     help="Fixed batch size; default 0 = dynamic batch")
    exp.add_argument("--output", default=None)

    run = sub.add_parser("RUN", help="Run an exported model")
    run.add_argument("MODEL", help="exported .stablehlo file")
    run.add_argument("SRC", help="file/dir to run the model on")
    run.add_argument("--classfile", "-c", help="file with list of class labels")
    run.add_argument("--batch", dest="batch_size", default=108, type=int)

    args = parser.parse_args(argv)
    if args.cmd_mode == "EXPORT":
        export_model(args.MODEL, args.output, args.batchsize,
                     args.half or args.precision == "bf16",
                     precision=args.precision, calib=args.calib,
                     calib_count=args.calib_count)
    elif args.cmd_mode == "RUN":
        run_exported(args.MODEL, args.SRC, args.classfile, args.batch_size)
    else:
        parser.error("EXPORT or RUN required")


if __name__ == "__main__":
    main_cli()
