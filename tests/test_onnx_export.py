"""Genuine `.onnx` EXPORT (export.py:export_onnx): the reference's
deployment artifact contract (neuston_onnx.py:17-65) — input 'input' NCHW
with a dynamic batch axis unless --batchsize, output 'output' logits,
opset 12, sidecar .classes — produced from OUR checkpoints via the
flax→torch weight round-trip.

No `onnx` package exists in this environment (that's the point: export
works without it), so validation is a minimal first-party protobuf-wire
walker over the ModelProto plus numeric parity of the traced torch module
against the flax model (the graph is whatever torch traces from that
module, the same exporter machinery the reference used)."""

import json
import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# minimal protobuf wire-format reader (no deps). ONNX field numbers from
# onnx.proto: ModelProto{1:ir_version, 7:graph, 8:opset_import},
# OperatorSetId{1:domain, 2:version}, GraphProto{1:node, 5:initializer,
# 11:input, 12:output}, NodeProto{1:input, 2:output, 4:op_type},
# ValueInfo{1:name, 2:type}, Type{1:tensor_type}, Tensor{1:elem_type,
# 2:shape}, Shape{1:dim}, Dim{1:dim_value, 2:dim_param},
# TensorProto{1:dims, 2:data_type, 8:name}.

def _fields(buf):
    """Yield (field_number, wire_type, value) triples from a proto buffer."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 1:
            val = struct.unpack_from("<q", buf, i)[0]; i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]; i += ln
        elif wt == 5:
            val = struct.unpack_from("<i", buf, i)[0]; i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _varint(buf, i):
    shift = result = 0
    while True:
        b = buf[i]; i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _group(buf):
    out = {}
    for field, _, val in _fields(buf):
        out.setdefault(field, []).append(val)
    return out


def read_onnx(path):
    """ModelProto → dict(ir_version, opset, ops, inputs, outputs,
    initializers). inputs/outputs are (name, elem_type, dims) with dims as
    ints (dim_value) or strings (dim_param)."""
    model = _group(open(path, "rb").read())
    out = {"ir_version": model[1][0]}
    dom = {}
    for op in model.get(8, []):
        g = _group(op)
        dom[g.get(1, [b""])[0].decode()] = g.get(2, [0])[0]
    out["opset"] = dom.get("", 0)
    graph = _group(model[7][0])
    out["ops"] = [_group(nd).get(4, [b""])[0].decode()
                  for nd in graph.get(1, [])]
    out["initializers"] = [_group(t).get(8, [b""])[0].decode()
                           for t in graph.get(5, [])]

    def vinfo(b):
        g = _group(b)
        name = g.get(1, [b""])[0].decode()
        ttype = _group(_group(g[2][0])[1][0])  # type.tensor_type
        elem = ttype.get(1, [0])[0]
        dims = []
        if 2 in ttype:
            for d in _group(ttype[2][0]).get(1, []):
                dg = _group(d)
                dims.append(dg[2][0].decode() if 2 in dg
                            else dg.get(1, [0])[0])
        return name, elem, dims

    out["inputs"] = [vinfo(b) for b in graph.get(11, [])]
    out["outputs"] = [vinfo(b) for b in graph.get(12, [])]
    return out


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    """Tiny trained-shaped resnet18 checkpoint (randomized params)."""
    import jax

    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
    from ifcb_classifier_tpu.train.state import create_train_state

    model = get_namebrand_model("resnet18", 3)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), 32)
    p = str(tmp_path_factory.mktemp("onnx") / "m.ptl")
    save_checkpoint(p, state.params, state.batch_stats,
                    dict(MODEL="resnet18", classes=["a", "b", "c"],
                         resize=32, model_id="m", seed=1, img_norm=None,
                         pretrained=False))
    return p


class TestOnnxArtifact:
    def test_dynamic_batch_contract(self, ckpt):
        """Default export: FLOAT 'input' [batch,3,R,R] → 'output'
        [batch,n_classes], opset 12, Conv/BN/Gemm graph with weights
        stored as initializers (neuston_onnx.py:44-58)."""
        from ifcb_classifier_tpu.export import export_onnx

        out = export_onnx(ckpt)
        assert out.endswith(".onnx") and os.path.getsize(out) > 10_000_000
        m = read_onnx(out)
        assert m["opset"] == 12
        assert {"Conv", "Relu", "MaxPool", "Gemm"} <= set(m["ops"])
        (iname, ielem, idims), = m["inputs"]
        assert (iname, ielem) == ("input", 1)  # 1 = FLOAT
        assert idims == ["batch_size", 3, 32, 32]
        (oname, oelem, odims), = m["outputs"]
        assert (oname, oelem) == ("output", 1)
        assert odims == ["batch_size", 3]
        # do_constant_folding=True pre-fuses BN into conv weights (the
        # reference exports with the same flag, neuston_onnx.py:52), so
        # count fused initializers, not raw tensors
        assert len(m["initializers"]) > 20  # weights embedded
        classes = open(out.replace(".onnx", ".classes")).read().splitlines()
        assert classes == ["a", "b", "c"]

    def test_fixed_batch_and_opset(self, ckpt):
        from ifcb_classifier_tpu.export import export_onnx

        out = export_onnx(ckpt, batchsize=4, opset=13)
        m = read_onnx(out)
        assert m["opset"] == 13
        assert m["inputs"][0][2] == [4, 3, 32, 32]
        assert m["outputs"][0][2] == [4, 3]

    def test_metadata_sidecar_carries_imgnorm(self, tmp_path):
        """export_onnx writes the same .json sidecar the StableHLO export
        does, so _run_onnx can serve img-norm models with the checkpoint's
        normalization (round-4 review)."""
        import jax

        from ifcb_classifier_tpu.export import export_onnx
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        from ifcb_classifier_tpu.train.state import create_train_state

        model = get_namebrand_model("resnet18", 2)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), 32)
        p = str(tmp_path / "n.ptl")
        save_checkpoint(p, state.params, state.batch_stats,
                        dict(MODEL="resnet18", classes=["a", "b"], resize=32,
                             model_id="n", seed=1,
                             img_norm=["0.5,0.4,0.3", "0.25"]))
        out = export_onnx(p, output=str(tmp_path / "n.onnx"), batchsize=2)
        meta = json.load(open(out + ".json"))
        assert meta["img_norm"] == ["0.5,0.4,0.3", "0.25"]
        assert meta["model"] == "resnet18" and meta["resize"] == 32
        assert meta["batchsize"] == 2 and meta["precision"] == "fp32"

    def test_half_emits_fp16_artifact(self, ckpt, tmp_path):
        """--half: fp16 tensors (elem_type 10) and the .FP16.onnx naming
        (neuston_onnx.py:31-33)."""
        from ifcb_classifier_tpu.export import export_onnx

        out = export_onnx(ckpt, output=str(tmp_path / "h.onnx"), half=True)
        m = read_onnx(out)
        assert m["inputs"][0][1] == 10  # FLOAT16
        # fp16 default naming when --output is not given
        out2 = export_onnx(ckpt, half=True)
        assert out2.endswith(".FP16.onnx")

    def test_cli_format_onnx(self, ckpt):
        from ifcb_classifier_tpu.export import main_cli

        main_cli(["EXPORT", ckpt, "--format", "onnx"])
        assert os.path.isfile(ckpt.replace(".ptl", ".onnx"))

    def test_cli_rejects_int8_onnx(self, ckpt):
        from ifcb_classifier_tpu.export import main_cli

        with pytest.raises(SystemExit):
            main_cli(["EXPORT", ckpt, "--format", "onnx",
                      "--precision", "int8"])


class TestExportPathSafety:
    """Artifact-path fixes: extension handling must never clobber the
    just-written artifact or relocate outputs out of dotted directories."""

    def test_output_without_onnx_suffix_not_clobbered(self, ckpt, tmp_path):
        """--output with no '.onnx' substring: the old
        output.replace('.onnx', '.classes') returned the SAME path and
        truncated the ModelProto with the class list."""
        from ifcb_classifier_tpu.export import export_onnx

        out = export_onnx(ckpt, output=str(tmp_path / "model_v2"))
        assert out == str(tmp_path / "model_v2")
        assert os.path.getsize(out) > 10_000_000  # still the ModelProto
        classes = open(str(tmp_path /
                           "model_v2.classes")).read().splitlines()
        assert classes == ["a", "b", "c"]

    def test_dotted_dir_default_naming_stays_in_dir(self, ckpt, tmp_path):
        """str.replace('.ckpt', '') on the whole path used to rewrite a
        '.ckpt_backups' DIRECTORY name, silently relocating the artifact."""
        import shutil

        from ifcb_classifier_tpu.export import export_onnx

        d = tmp_path / "run.ckpt_backups"
        d.mkdir()
        p = str(d / "m.ptl")
        shutil.copy(ckpt, p)
        out = export_onnx(p)
        assert out == str(d / "m.onnx") and os.path.isfile(out)

    def test_fixed_batch_artifact_adapts_run_batch(self, ckpt, tmp_path):
        """A fixed-batch (--batchsize) artifact records its batch in
        meta.json and RUN sizes the loader to it, instead of dying in
        jax.export shape checking on a --batch mismatch."""
        import json as _json

        from fixtures import write_image_folder_dataset
        from ifcb_classifier_tpu.export import export_model, run_exported

        out = export_model(ckpt, output=str(tmp_path / "m.stablehlo"),
                           batchsize=4)
        assert _json.load(open(out + ".json"))["batchsize"] == 4
        imgdir = write_image_folder_dataset(str(tmp_path / "imgs"),
                                            {"a": 5})
        scores, paths = run_exported(out, imgdir, batch_size=8)
        assert len(paths) == 5 and scores.shape == (5, 3)

    def test_int8_no_fold_env_names_the_env_var(self, ckpt, tmp_path,
                                                monkeypatch):
        """With IFCBNN_NO_FOLD=1 the int8 precondition error must blame the
        env override, not falsely claim the family is unsupported."""
        from ifcb_classifier_tpu.export import export_model

        monkeypatch.setenv("IFCBNN_NO_FOLD", "1")
        with pytest.raises(ValueError, match="IFCBNN_NO_FOLD"):
            export_model(ckpt, output=str(tmp_path / "x.stablehlo"),
                         precision="int8", calib=str(tmp_path))


class TestRunArtifactGuards:
    def test_run_rejects_onnx_artifact_with_guidance(self, tmp_path):
        """Without onnxruntime installed, RUN on a .onnx must give guidance
        (install ort, or use the StableHLO artifact), not an opaque
        flatbuffer error. On boxes WITH onnxruntime the serving path is
        covered by test_run_onnx_serves_with_ort instead."""
        try:
            import onnxruntime  # noqa: F401
            pytest.skip("onnxruntime installed: refusal path unreachable")
        except ImportError:
            pass
        from ifcb_classifier_tpu.export import run_exported

        p = str(tmp_path / "m.onnx")
        open(p, "wb").write(b"\x08\x07")  # any bytes; name decides
        with pytest.raises(ValueError, match="pip install onnxruntime"):
            run_exported(p, str(tmp_path))

    def test_run_onnx_serves_with_ort(self, ckpt, tmp_path):
        """With onnxruntime importable, RUN serves the .onnx artifact
        in-framework (the reference's neuston_onnx.py:68-107 RUN): scores
        are softmaxed logits matching the engine within trace tolerance."""
        pytest.importorskip("onnxruntime")
        from PIL import Image
        from fixtures import make_roi
        from ifcb_classifier_tpu.export import export_onnx, run_exported
        from ifcb_classifier_tpu.infer.runner import InferenceEngine

        out = export_onnx(ckpt, output=str(tmp_path / "m.onnx"))
        srcdir = tmp_path / "imgs"
        srcdir.mkdir()
        for i in range(3):
            Image.fromarray(make_roi(20, 24, seed=i)).save(
                str(srcdir / f"x{i}.png"))
        scores, paths = run_exported(out, str(srcdir), batch_size=4)
        assert scores.shape == (3, 3) and len(paths) == 3
        np.testing.assert_allclose(scores.sum(axis=1), 1.0, atol=1e-5)
        import jax.numpy as jnp
        eng = InferenceEngine(ckpt, batch_size=4, dtype=jnp.float32,
                              fold=False)
        ref = eng.predict_images([np.asarray(Image.open(p).convert("L"))
                                  for p in paths])
        np.testing.assert_allclose(scores, ref, atol=2e-3)

    @staticmethod
    def _fake_ort(record, *, resize=28, fixed_batch=None, half=False):
        """Stand-in onnxruntime module: the session's contract (input 0's
        shape/type drive resize, batch, and dtype; run(["output"],
        {"input": x}) returns logits). Logits are 8*mean(x) spread over
        3 classes so softmax ordering tracks image brightness — lets the
        test pin input-order preservation across batches without a real
        runtime (onnxruntime is absent from this image; the live-ort arm
        is test_run_onnx_serves_with_ort)."""
        import types

        class _Inp:
            name = "input"
            shape = [fixed_batch if fixed_batch else "batch",
                     3, resize, resize]
            type = "tensor(float16)" if half else "tensor(float)"

        class _Session:
            def __init__(self, path):
                record["path"] = path

            def get_inputs(self):
                return [_Inp()]

            def run(self, outs, feeds):
                assert outs == ["output"]
                x = feeds["input"]
                record.setdefault("dtypes", []).append(x.dtype)
                record.setdefault("shapes", []).append(x.shape)
                record.setdefault("means", []).append(
                    float(x.astype(np.float32).mean()))
                m = x.astype(np.float32).mean(axis=(1, 2, 3))
                z = np.zeros_like(m)
                return [np.stack([8 * m, z, -8 * m], axis=1)]

        mod = types.ModuleType("onnxruntime")
        mod.InferenceSession = _Session
        return mod

    def _brightness_pngs(self, tmp_path, values):
        """One constant-brightness grayscale PNG per value; returns srcdir.
        After /255 preprocessing each image's mean IS value/255, so the
        fake session's logits are strictly ordered by `values`."""
        from PIL import Image
        srcdir = tmp_path / "imgs"
        srcdir.mkdir()
        for i, v in enumerate(values):
            Image.fromarray(np.full((20, 24), v, np.uint8)).save(
                str(srcdir / f"x{i}.png"))
        return srcdir

    def test_run_onnx_plumbing_with_fake_ort(self, tmp_path, monkeypatch,
                                             capsys):
        """Drives _run_onnx end-to-end against the fake session: resize
        read off the artifact (not hardcoded 299 like neuston_onnx.py:84),
        dynamic batch honors --batch, scores stay in input order across
        batches, pad rows are trimmed, .classes sidecar labels print."""
        record = {}
        monkeypatch.setitem(sys.modules, "onnxruntime",
                            self._fake_ort(record, resize=28))
        from ifcb_classifier_tpu.export import run_exported

        values = [10, 200, 60, 140, 30]
        srcdir = self._brightness_pngs(tmp_path, values)
        art = tmp_path / "m.onnx"
        art.write_bytes(b"\x08\x07")  # fake session never parses it
        (tmp_path / "m.classes").write_text("alpha\nbeta\ngamma\n")

        scores, paths = run_exported(str(art), str(srcdir), batch_size=2)
        assert scores.shape == (5, 3) and len(paths) == 5
        assert [os.path.basename(p) for p in paths] == \
            [f"x{i}.png" for i in range(5)]
        np.testing.assert_allclose(scores.sum(axis=1), 1.0, atol=1e-6)
        # 5 images at --batch 2 -> 3 session calls, each the full padded
        # batch at the artifact's 28x28 NCHW
        assert record["shapes"] == [(2, 3, 28, 28)] * 3
        assert all(d == np.float32 for d in record["dtypes"])
        # class-0 probability is monotonic in brightness: order preserved
        assert (np.argsort(scores[:, 0]).tolist()
                == np.argsort(values).tolist())
        # brightest image is most class-0; .classes labels were printed
        out = capsys.readouterr().out
        assert "alpha" in out and out.count("alpha") >= 1

    def test_run_onnx_honors_imgnorm_sidecar(self, tmp_path, monkeypatch):
        """An img-norm model served via RUN model.onnx must see NORMALIZED
        inputs (round-4 review: the onnx arm silently skipped the
        checkpoint's --img-norm, reintroducing the reference quirk QUIRKS.md
        declares FIXED). export_onnx writes the .json sidecar; _run_onnx
        applies its img_norm before the session call."""
        import json as _json
        record = {}
        monkeypatch.setitem(sys.modules, "onnxruntime",
                            self._fake_ort(record, resize=24))
        from ifcb_classifier_tpu.export import run_exported

        v = 204  # v/255 = 0.8; with mean .5 / std .25 the net input is 1.2
        srcdir = self._brightness_pngs(tmp_path, [v])
        art = tmp_path / "m.onnx"
        art.write_bytes(b"\x08\x07")
        (tmp_path / "m.onnx.json").write_text(
            _json.dumps({"img_norm": ["0.5", "0.25"], "resize": 24}))

        run_exported(str(art), str(srcdir), batch_size=1)
        assert record["shapes"] == [(1, 3, 24, 24)]
        np.testing.assert_allclose(record["means"], [1.2], atol=1e-3)

        # sidecar removed (an artifact from an actual reference install):
        # served reference-style, un-normalized — the raw 0.8
        record2 = {}
        monkeypatch.setitem(sys.modules, "onnxruntime",
                            self._fake_ort(record2, resize=24))
        os.remove(str(tmp_path / "m.onnx.json"))
        run_exported(str(art), str(srcdir), batch_size=1)
        np.testing.assert_allclose(record2["means"], [0.8], atol=1e-3)

    def test_run_onnx_fp16_fixed_batch_with_fake_ort(self, tmp_path,
                                                     monkeypatch):
        """A .FP16 artifact with a FIXED batch axis: inputs are cast to
        float16 and the artifact's batch (2) overrides --batch 4."""
        record = {}
        monkeypatch.setitem(
            sys.modules, "onnxruntime",
            self._fake_ort(record, resize=24, fixed_batch=2, half=True))
        from ifcb_classifier_tpu.export import run_exported

        srcdir = self._brightness_pngs(tmp_path, [50, 180, 120])
        art = tmp_path / "m.FP16.onnx"
        art.write_bytes(b"\x08\x07")

        scores, paths = run_exported(str(art), str(srcdir), batch_size=4)
        assert scores.shape == (3, 3) and len(paths) == 3
        assert record["shapes"] == [(2, 3, 24, 24)] * 2
        assert all(d == np.float16 for d in record["dtypes"])
        assert np.isfinite(scores).all()


class TestTracedGraphParity:
    def test_torch_twin_matches_flax_for_bottleneck_family(self):
        """The exporter's fidelity argument: the traced torch module
        produces the flax model's logits. Exercised here on resnet50 —
        the Bottleneck path no other parity test covers."""
        import jax
        import jax.numpy as jnp
        import torch

        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.models.torch_zoo import (build_torch_model,
                                                          load_flax_weights)
        from ifcb_classifier_tpu.train.state import create_train_state

        model = get_namebrand_model("resnet50", 4)
        state, _ = create_train_state(model, jax.random.PRNGKey(1), 64)
        tm = build_torch_model("resnet50", 4)
        load_flax_weights(tm, "resnet50", state.params, state.batch_stats)
        tm.eval()
        x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        f = np.asarray(model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(x), train=False))
        assert float(np.abs(t - f).max()) < 2e-4

    def test_torch_twin_matches_flax_for_vgg_bn(self):
        """vgg*_bn BN-indexed features numbering through the port."""
        import jax
        import jax.numpy as jnp
        import torch

        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.models.torch_zoo import (build_torch_model,
                                                          load_flax_weights)
        from ifcb_classifier_tpu.train.state import create_train_state

        # 224: vgg's adaptive 7x7 pool needs the full torchvision geometry
        model = get_namebrand_model("vgg11_bn", 3)
        state, _ = create_train_state(model, jax.random.PRNGKey(2), 224)
        tm = build_torch_model("vgg11_bn", 3)
        load_flax_weights(tm, "vgg11_bn", state.params, state.batch_stats)
        tm.eval()
        x = np.random.RandomState(2).rand(2, 224, 224, 3).astype(np.float32)
        with torch.no_grad():
            t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        f = np.asarray(model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(x), train=False))
        assert float(np.abs(t - f).max()) < 2e-4

    def test_torch_twin_matches_flax_for_efficientnet_b3(self):
        """b1-b7 scale the zoo via round_filters/round_repeats; b3 checks
        the generalized torch twin agrees with flax on the rounded channel
        plan (width 1.2, depth 1.4) — the old per-variant b0 module never
        exercised this."""
        import jax
        import jax.numpy as jnp
        import torch

        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.models.torch_zoo import (build_torch_model,
                                                          load_flax_weights)
        from ifcb_classifier_tpu.train.state import create_train_state

        model = get_namebrand_model("efficientnet_b3", 3)
        state, _ = create_train_state(model, jax.random.PRNGKey(3), 64)
        tm = build_torch_model("efficientnet_b3", 3)
        load_flax_weights(tm, "efficientnet_b3", state.params,
                          state.batch_stats)
        tm.eval()
        x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        f = np.asarray(model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(x), train=False))
        assert float(np.abs(t - f).max()) < 5e-4

    def test_efficientnet_twin_stochastic_depth_schedule(self):
        """The handed-back torch module must carry torchvision's
        stochastic-depth regularizer for fine-tuning (parameterless —
        state_dict and eval/ONNX output unaffected): survival schedule is
        0.2 linearly scaled over the global block index, same as the flax
        model (models/efficientnet.py), and training-mode forward is
        stochastic while eval stays deterministic."""
        import torch

        from ifcb_classifier_tpu.models.torch_zoo import (_MBConv,
                                                          build_torch_model)

        tm = build_torch_model("efficientnet_b0", 3)
        probs = [m.sd_prob for m in tm.modules() if isinstance(m, _MBConv)]
        assert len(probs) == 16 and probs[0] == 0.0
        assert probs == sorted(probs) and abs(probs[-1] - 0.2 * 15 / 16) < 1e-9
        x = torch.randn(4, 3, 64, 64)
        tm.train()
        torch.manual_seed(0)
        a = tm(x).detach()
        torch.manual_seed(1)
        b = tm(x).detach()
        assert not torch.allclose(a, b)  # row-dropped residuals differ
        tm.eval()
        with torch.no_grad():
            assert torch.allclose(tm(x), tm(x))  # identity in eval

    def test_torch_twin_matches_flax_for_densenet169(self):
        import jax
        import jax.numpy as jnp
        import torch

        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.models.torch_zoo import (build_torch_model,
                                                          load_flax_weights)
        from ifcb_classifier_tpu.train.state import create_train_state

        model = get_namebrand_model("densenet169", 3)
        state, _ = create_train_state(model, jax.random.PRNGKey(4), 64)
        tm = build_torch_model("densenet169", 3)
        load_flax_weights(tm, "densenet169", state.params,
                          state.batch_stats)
        tm.eval()
        x = np.random.RandomState(4).rand(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        f = np.asarray(model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(x), train=False))
        assert float(np.abs(t - f).max()) < 2e-4

    def test_load_flax_weights_rejects_family_mismatch(self):
        import jax

        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.models.torch_zoo import (build_torch_model,
                                                          load_flax_weights)
        from ifcb_classifier_tpu.train.state import create_train_state

        model = get_namebrand_model("resnet18", 3)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), 32)
        tm = build_torch_model("resnet34", 3)
        with pytest.raises((ValueError, RuntimeError)):
            load_flax_weights(tm, "resnet18", state.params,
                              state.batch_stats)


class TestInceptionOnnx:
    def test_flagship_exports_with_transform_input(self, tmp_path):
        """inception_v3 with pretrained=True: the ONNX graph must open
        with the transform_input channel renormalization (torchvision
        factory rule) before the stem conv — Mul/Add/Concat nodes precede
        the first Conv."""
        import jax

        from ifcb_classifier_tpu.export import export_onnx
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        from ifcb_classifier_tpu.train.state import create_train_state

        model = get_namebrand_model("inception_v3", 2, pretrained=True)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), 299)
        p = str(tmp_path / "inc.ptl")
        save_checkpoint(p, state.params, state.batch_stats,
                        dict(MODEL="inception_v3", classes=["a", "b"],
                             resize=299, model_id="inc", seed=1,
                             img_norm=None, pretrained=True))
        out = export_onnx(p)
        m = read_onnx(out)
        assert m["inputs"][0][2] == ["batch_size", 3, 299, 299]
        assert m["outputs"][0][2] == ["batch_size", 2]
        first_conv = m["ops"].index("Conv")
        prelude = set(m["ops"][:first_conv])
        assert "Concat" in prelude and ("Mul" in prelude or "Add" in prelude)
        # single output: eval-mode trace has no aux head (torchvision
        # contract; neuston_onnx.py:23 exports an .eval() model)
        assert len(m["outputs"]) == 1
