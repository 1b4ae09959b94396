"""Model export + exported-model inference — the ONNX sidecar's role
(/root/reference/neuston_onnx.py) in TPU-native form.

EXPORT: checkpoint → serialized StableHLO artifact (jax.export) + newline-
        delimited .classes file (the reference's .onnx + .classes contract,
        neuston_onnx.py:44-65). Supports fixed or dynamic ("poly") batch and
        fp32/bf16 ("--half" analog).
        `--format onnx` instead emits a GENUINE `.onnx` ModelProto with the
        reference's exact artifact contract (input 'input' NCHW float,
        output 'output' logits, dynamic batch axis unless --batchsize,
        opset 12 default, sidecar `.classes`; neuston_onnx.py:44-65) so
        existing onnxruntime deployments consume our trained models with no
        pipeline change: weights round-trip through the first-party torch
        zoo (models/torch_zoo.py) and torch.onnx traces it — the same
        exporter machinery the reference used.
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


def _strip_ckpt_ext(path: str) -> str:
    """Strip a TRAILING .ptl/.ckpt only. str.replace would substitute
    anywhere in the path (…/run.ckpt_backups/m.ptl → …/run_backups/m),
    silently relocating the artifact to a different directory."""
    stem, ext = os.path.splitext(path)
    return stem if ext in (".ptl", ".ckpt") else path


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
    from .models import input_size_for
    # same fallback as export_onnx: hand-built/external checkpoints may
    # lack the resize hparam
    resize = int(hparams.get("resize") or input_size_for(hparams["MODEL"]))
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
        if not supports_quant(hparams["MODEL"]):
            raise ValueError(f"--precision int8 unsupported for "
                             f"{hparams['MODEL']!r} (needs a foldable, "
                             "non-grouped-conv family)")
        if not folded:
            raise ValueError("--precision int8 requires BN folding — "
                             "unset IFCBNN_NO_FOLD to export int8")
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
        output = _strip_ckpt_ext(ckpt_path)
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
                       # 0 = dynamic batch; a fixed value lets RUN size its
                       # loader to the serialized signature instead of dying
                       # in jax.export shape checking
                       batchsize=batchsize,
                       precision=("int8" if quant
                                  else "bf16" if half else "fp32"),
                       calib_src=(os.path.abspath(calib) if quant
                                  else None)), f)
    return output


def _patch_torch_onnx_serializer():
    """Allow `torch.onnx.export` without the `onnx` pip package.

    The legacy (TorchScript) exporter builds and serializes the ModelProto
    entirely in torch's C++ — the only hard `import onnx` on the path is
    `_add_onnxscript_fn`, a post-pass that splices onnxscript custom-op
    FunctionProtos into the model and is a no-op for graphs made of
    standard ONNX ops (every model in our zoo). When onnx is absent, patch
    that pass to identity; when it's installed (typical deployment boxes),
    do nothing."""
    try:
        import onnx  # noqa: F401
        return
    except ImportError:
        pass
    try:
        from torch.onnx._internal.torchscript_exporter import (
            onnx_proto_utils as _opu)
        _opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    except Exception as e:  # torch layout changed: surface the real fix
        raise RuntimeError(
            "torch.onnx needs the `onnx` package on this torch version "
            "(the no-onnx compatibility patch no longer applies): "
            f"{e}") from e


def export_onnx(ckpt_path: str, output: str | None = None,
                batchsize: int = 0, half: bool = False, opset: int = 12,
                device: str = "cpu"):
    """checkpoint → genuine `.onnx` + `.classes`, the reference's exact
    deployment artifact (neuston_onnx.py:17-65: eval+freeze, optional
    --half, dummy input batch 10 when dynamic, opset 12, input/output
    names, do_constant_folding).

    The traced module is models/torch_zoo.py's torch twin of the flax
    model, filled from the checkpoint via the lossless flax→torch port
    (models/torch_port.py export_state_dict); logits parity between the two
    is pinned by tests/test_torch_parity.py. The graph is exported
    UNFOLDED (BN nodes present, like the reference's) — onnxruntime fuses
    conv+BN itself at session build."""
    import torch

    from .models import input_size_for
    from .models.torch_zoo import build_torch_model, load_flax_weights
    from .train.checkpoint import load_checkpoint

    params, batch_stats, hparams = load_checkpoint(ckpt_path)
    classes = hparams["classes"]
    family = hparams["MODEL"]
    # pretrained inception carries transform_input=True into the artifact
    # (torchvision factory rule; mirrored by InferenceEngine + StableHLO
    # export above)
    model = build_torch_model(
        family, len(classes),
        transform_input=(family == "inception_v3"
                         and bool(hparams.get("pretrained"))))
    load_flax_weights(model, family, params, batch_stats)
    model.eval()
    if device != "cpu":
        model.to(device)
    if half:
        model.half()

    size = int(hparams.get("resize") or input_size_for(family))
    dummy_batch = batchsize if batchsize else 10  # neuston_onnx.py:37
    dummy = torch.randn(dummy_batch, 3, size, size, device=device)
    if half:
        dummy = dummy.half()
    dynamic_axes = (None if batchsize
                    else {"input": {0: "batch_size"},
                          "output": {0: "batch_size"}})

    if output:
        os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
    else:
        output = _strip_ckpt_ext(ckpt_path) + (".FP16.onnx" if half
                                               else ".onnx")

    _patch_torch_onnx_serializer()
    kwargs = dict(export_params=True, opset_version=opset,
                  do_constant_folding=True,
                  input_names=["input"], output_names=["output"],
                  dynamic_axes=dynamic_axes)
    # dynamo=False pins the legacy TorchScript exporter on torch >= 2.6
    # (where dynamo became the default and would change the graph
    # contract); older torch (the reference's 1.7 era) has no such kwarg
    # and TorchScript export is already its default. Decided by signature
    # inspection, NOT try/except TypeError: a TypeError raised from inside
    # tracing must surface, not silently retrigger a full re-export under
    # the other exporter.
    import inspect
    try:
        if "dynamo" in inspect.signature(torch.onnx.export).parameters:
            kwargs["dynamo"] = False
    except (ValueError, TypeError):
        kwargs["dynamo"] = False  # signature unavailable: pin explicitly
    with torch.no_grad():
        torch.onnx.export(model, dummy, output, **kwargs)
    print("EXPORTED:", output)

    # strip only a TRAILING .onnx: replace() on a user --output with no
    # ".onnx" substring would return the SAME path and truncate the
    # just-written ModelProto with the class list
    stem = output[:-len(".onnx")] if output.endswith(".onnx") else output
    classes_file = stem + ".classes"
    with open(classes_file, "w") as f:
        f.write("\n".join(classes))
    print("EXPORTED:", classes_file)
    # metadata sidecar, same contract as the StableHLO export's: _run_onnx
    # reads img_norm/resize from it so an img-norm model served via `RUN
    # model.onnx` sees the SAME normalized inputs as every other serving
    # path (QUIRKS.md declares the reference's missing-normalization quirk
    # FIXED; artifacts from an actual reference install have no sidecar
    # and are served reference-style, un-normalized)
    meta_file = output + ".json"
    with open(meta_file, "w") as f:
        json.dump(dict(model=family, resize=size,
                       img_norm=hparams.get("img_norm"),
                       model_id=hparams.get("model_id"),
                       n_classes=len(classes), batchsize=batchsize,
                       precision="fp16" if half else "fp32"), f)
    return output


def _load_artifact_meta(model_path: str) -> dict:
    """The exporters' `<artifact>.json` sidecar, {} when absent (e.g. an
    artifact produced by an actual reference installation)."""
    if os.path.isfile(model_path + ".json"):
        with open(model_path + ".json") as f:
            return json.load(f)
    return {}


def _parse_meta_imgnorm(meta: dict):
    """(mean, std) from a metadata sidecar's img_norm entry, (None, None)
    when the model was trained without --img-norm."""
    img_norm = meta.get("img_norm")
    if not img_norm:
        return None, None
    from .data.datasets import parse_imgnorm
    return parse_imgnorm(img_norm)


def _serve_images(src: str, batch_size: int, resize: int, mean, std,
                  run_batch):
    """The serving loop both RUN artifact arms share: list images →
    HostLoader canvas batches → prefetch → device/ort preprocess+predict →
    pad-row trim. `run_batch(images_nhwc_f32) -> [B, C] softmax scores`.
    One loop means the two arms cannot drift on normalization, padding, or
    path bookkeeping (they once did — round-4 review)."""
    from .data.datasets import list_image_paths
    from .data.pipeline import HostLoader, prefetch
    from .ops.preprocess import preprocess_batch

    img_paths = list_image_paths(src)
    assert img_paths, "No images to process"
    loader = HostLoader(img_paths, batch_size=batch_size, rgb=True)
    all_scores, paths = [], []
    for b in prefetch(iter(loader)):
        images = np.asarray(preprocess_batch(b["canvas"], b["sizes"],
                                             out_size=resize, mean=mean,
                                             std=std))
        out = run_batch(images)
        n = int(b["mask"].sum())
        all_scores.append(np.asarray(out)[:n])
        paths.extend(loader.items[i] for i in b["indices"][:n])
    return np.concatenate(all_scores), paths


def _print_predictions(scores, classfile):
    """Reference-parity stdout: max score, argmax, labels when the
    `.classes` sidecar exists (neuston_onnx.py:89-107)."""
    output_classes = np.argmax(scores, axis=1)
    print(np.max(scores, axis=1))
    print(output_classes)
    if os.path.isfile(classfile):
        with open(classfile) as f:
            classes = f.read().splitlines()
        print([classes[i] for i in output_classes])


def _run_onnx(model_path: str, src: str, classfile: str | None = None,
              batch_size: int = 108):
    """Serve a `.onnx` artifact via onnxruntime — the reference's
    `neuston_onnx.py RUN` (neuston_onnx.py:68-107), available whenever
    onnxruntime is importable (deployment boxes have it; this dev image
    does not). Batches stream through the session like the StableHLO path
    instead of the reference's one-giant-input-array quirk (QUIRKS.md).

    The artifact contract comes from export_onnx: input "input" NCHW
    (fp16 for .FP16.onnx artifacts), output "output" = raw logits —
    softmax is applied post-hoc exactly like the reference. img_norm (and
    a resize fallback) come from the exporter's `.json` sidecar; an
    artifact from an actual reference install has neither and is served
    reference-style."""
    import onnxruntime as ort

    meta = _load_artifact_meta(model_path)
    mean, std = _parse_meta_imgnorm(meta)

    sess = ort.InferenceSession(model_path)
    inp = sess.get_inputs()[0]
    # [batch, 3, H, W]; H/W are static in the trace — the trace is ground
    # truth, the sidecar then the reference's hardcoded 299
    # (neuston_onnx.py:84) are the fallbacks.
    resize = (inp.shape[2] if isinstance(inp.shape[2], int)
              else meta.get("resize", 299))
    half = "float16" in (inp.type or "")
    fixed = inp.shape[0] if isinstance(inp.shape[0], int) else 0
    if fixed and fixed != batch_size:
        print(f"artifact was exported with fixed batch {fixed}; "
              f"using it instead of --batch {batch_size}")
        batch_size = fixed

    def run_batch(images):
        x = images.transpose(0, 3, 1, 2)  # NHWC (ours) -> NCHW (trace)
        out = sess.run(["output"], {
            "input": x.astype(np.float16 if half else np.float32)})[0]
        z = np.asarray(out, np.float32)
        z -= z.max(axis=1, keepdims=True)  # logits -> softmax, post-hoc
        ez = np.exp(z)
        return ez / ez.sum(axis=1, keepdims=True)

    scores, paths = _serve_images(src, batch_size, resize, mean, std,
                                  run_batch)
    _print_predictions(scores,
                       classfile or model_path[:-len(".onnx")] + ".classes")
    return scores, paths


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
    if model_path.endswith(".onnx"):
        try:
            import onnxruntime  # noqa: F401
        except ImportError:
            raise ValueError(
                "{} is an ONNX artifact; serving it in-framework needs "
                "`onnxruntime` (not installed here) — pip install "
                "onnxruntime (then see docs/DEPLOYMENT.md 'First-box ONNX "
                "validation checklist'), or RUN the StableHLO artifact "
                "(`ifcbnn-export EXPORT` default format)".format(model_path))
        return _run_onnx(model_path, src, classfile, batch_size)
    import jax.numpy as jnp
    from jax import export as jexport

    with open(model_path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))

    meta = _load_artifact_meta(model_path)
    resize = meta.get("resize", 299)  # neuston_onnx.py:84 hardcodes 299
    # a fixed-batch artifact (EXPORT --batchsize N) serialized an exact
    # [N,...] signature: size the loader to it (HostLoader pads the tail),
    # instead of letting exported.call die in opaque shape checking
    fixed = int(meta.get("batchsize") or 0)
    if fixed and fixed != batch_size:
        print(f"artifact was exported with fixed batch {fixed}; "
              f"using it instead of --batch {batch_size}")
        batch_size = fixed
    mean, std = _parse_meta_imgnorm(meta)

    scores, paths = _serve_images(
        src, batch_size, resize, mean, std,
        lambda images: exported.call(jnp.asarray(images)))
    _print_predictions(scores, classfile or model_path + ".classes")
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
    exp.add_argument("--format", choices=["stablehlo", "onnx"],
                     default="stablehlo",
                     help="Artifact format: stablehlo (TPU-native, the "
                          "default) or onnx (a genuine .onnx ModelProto "
                          "with the reference's artifact contract, for "
                          "existing onnxruntime deployments)")
    exp.add_argument("--opset", default=12, type=int,
                     help="With --format onnx: ONNX opset version "
                          "(reference default 12, neuston_onnx.py:115)")
    exp.add_argument("--device", default="cpu", choices=("cpu", "cuda"),
                     help="With --format onnx: device to trace the export "
                          "on (reference surface, neuston_onnx.py:114); "
                          "cpu is correct everywhere")
    exp.add_argument("--output", default=None)

    run = sub.add_parser("RUN", help="Run an exported model")
    run.add_argument("MODEL", help="exported .stablehlo file")
    run.add_argument("SRC", help="file/dir to run the model on")
    run.add_argument("--classfile", "-c", help="newline-delimited class-label file (default: the artifact's .classes sidecar)")
    run.add_argument("--batch", dest="batch_size", default=108, type=int)

    args = parser.parse_args(argv)
    if args.cmd_mode:
        # loud notice for result-altering env knobs (IFCBNN_NO_FOLD
        # changes the exported graph) — see utils/envknobs.py
        from .utils.envknobs import warn_active_knobs
        warn_active_knobs(args.cmd_mode)
    if args.cmd_mode == "EXPORT":
        if args.format == "onnx":
            if args.precision == "int8":
                parser.error("--precision int8 is a StableHLO-artifact "
                             "feature; ONNX export emits the reference's "
                             "fp32/fp16 graph (use --half)")
            export_onnx(args.MODEL, args.output, args.batchsize,
                        args.half or args.precision == "bf16",
                        opset=args.opset, device=args.device)
        else:
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
