"""Opt-in int8 post-training quantization (models/quant.py, --precision
int8): numerics vs the folded full-precision graph, engine integration
(lazy first-batch calibration), CLI surface, and the unsupported-family
guard. No reference analog — this is the TPU-native speed tier beyond the
reference's fp32 eager inference (neuston_models.py:152-157)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_roi, write_bin
from test_fold import _randomized_variables


def _quant_pipeline(name, size, n_classes=5, batch=6):
    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.models import quant as Q
    from ifcb_classifier_tpu.models.fold import fold_params

    model = get_namebrand_model(name, n_classes)
    params, stats = _randomized_variables(model, jax.random.PRNGKey(1), size)
    fparams, fstats = fold_params(name, params, stats)
    fmodel = get_namebrand_model(name, n_classes, fold_bn=True)
    x = jax.random.uniform(jax.random.PRNGKey(2), (batch, size, size, 3))

    calib_fn, geoms = Q.make_calib_fn(fmodel)
    absmax = {k: float(v) for k, v in
              jax.device_get(jax.jit(calib_fn)(fparams, fstats, x)).items()}
    pruned, qconv = Q.quantize_params(fparams, geoms)
    pruned["__quant__"] = qconv
    predict_q = Q.make_quant_predict(fmodel, absmax, geoms)
    probs_q = jax.jit(predict_q)(pruned, fstats, x)

    from ifcb_classifier_tpu.train.state import make_predict_step
    probs = make_predict_step(fmodel)(fparams, fstats, x)
    return np.asarray(probs_q), np.asarray(probs), qconv, pruned


class TestQuantNumerics:
    @pytest.mark.parametrize("name,size", [("resnet18", 64),
                                           ("vgg11_bn", 224)])
    def test_scores_close_and_argmax_agrees(self, name, size):
        probs_q, probs, qconv, _ = _quant_pipeline(name, size)
        assert len(qconv) > 0
        # int8 PTQ gate: softmax scores drift at most ~1e-2, argmax holds
        assert float(np.abs(probs_q - probs).max()) < 2e-2
        assert (probs_q.argmax(-1) == probs.argmax(-1)).all()

    def test_weights_are_int8_and_pruned(self):
        probs_q, _, qconv, pruned = _quant_pipeline("resnet18", 32)
        leaf = next(iter(qconv.values()))
        assert leaf["w_int8"].dtype == np.int8
        assert leaf["w_scale"].ndim == 1 and leaf["bias"].ndim == 1
        # the original conv kernels must be GONE from the param tree
        # (shipping both would double weight traffic)
        assert "conv" not in pruned.get("conv1", {}), "kernel not pruned"
        assert np.isfinite(probs_q).all()

    def test_supports_quant_families(self):
        from ifcb_classifier_tpu.models.quant import supports_quant
        assert supports_quant("inception_v3")
        assert supports_quant("resnet50")
        assert supports_quant("vgg16_bn")
        assert not supports_quant("efficientnet_b0")  # depthwise convs
        assert not supports_quant("densenet121")      # not foldable
        assert not supports_quant("alexnet")          # no BN to fold


class TestEngineQuant:
    @pytest.fixture()
    def ckpt(self, tmp_path):
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        model = get_namebrand_model("resnet18", 2)
        params, stats = _randomized_variables(model, jax.random.PRNGKey(3),
                                              32)
        p = str(tmp_path / "m.ptl")
        save_checkpoint(p, params, stats,
                        dict(MODEL="resnet18", classes=["a", "b"], resize=32,
                             model_id="m", seed=1, img_norm=None))
        return p

    def test_engine_calibrates_on_first_batch_and_scores_match(self, ckpt):
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        rng = np.random.RandomState(0)
        imgs = [rng.randint(0, 255, (20 + i, 24 - i), np.uint8)
                for i in range(5)]
        eng = InferenceEngine(ckpt, batch_size=4, quant=True)
        assert eng.quant and not eng._quant_ready
        p_q = eng.predict_images(imgs)          # calibrates, then quantized
        assert eng._quant_ready
        ref = InferenceEngine(ckpt, batch_size=4)
        p_ref = ref.predict_images(imgs)
        assert p_q.shape == p_ref.shape
        assert np.abs(p_q - p_ref).max() < 2e-2
        assert (p_q.argmax(-1) == p_ref.argmax(-1)).all()
        # second call must reuse the quantized program (no recalibration):
        # identical inputs -> identical outputs
        p_q2 = eng.predict_images(imgs)
        np.testing.assert_array_equal(p_q, p_q2)

    def test_engine_quant_on_bins(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.data.ifcb import Bin
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        base = write_bin(str(tmp_path), "D20250401T000000_IFCB900",
                         [make_roi(18, 22, 1), make_roi(12, 12, 2)], 2)
        eng = InferenceEngine(ckpt, batch_size=8, quant=True)
        ref = InferenceEngine(ckpt, batch_size=8)
        t1, p1 = eng.predict_bin(Bin(base + ".adc"))
        t2, p2 = ref.predict_bin(Bin(base + ".adc"))
        assert t1 == t2
        assert np.abs(p1 - p2).max() < 2e-2

    def test_calib_batches_accumulates_then_swaps(self, ckpt):
        """--calib-batches N: the first N dispatches calibrate AND are
        served full-precision; the engine swaps to int8 only after N
        batches, with absmax = max over all calibration batches."""
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        rng = np.random.RandomState(1)
        # batch_size=4, 12 images -> 3 dispatches through _dispatch
        imgs = [rng.randint(0, 255, (16 + i % 5, 18 - i % 4), np.uint8)
                for i in range(12)]
        eng = InferenceEngine(ckpt, batch_size=4, quant=True,
                              calib_batches=2)
        ref = InferenceEngine(ckpt, batch_size=4)
        p = eng.predict_images(imgs)
        assert eng._quant_ready and eng._calib_seen == 2
        p_ref = ref.predict_images(imgs)
        # batches 1-2 (rows 0-7) went through the SAME fp folded graph
        np.testing.assert_array_equal(p[:8], p_ref[:8])
        # batch 3 (rows 8-11) is int8: close, argmax agrees
        assert np.abs(p[8:] - p_ref[8:]).max() < 2e-2
        assert (p[8:].argmax(-1) == p_ref[8:].argmax(-1)).all()
        # a later identical call is fully int8 and deterministic
        p2 = eng.predict_images(imgs)
        p3 = eng.predict_images(imgs)
        np.testing.assert_array_equal(p2, p3)
        assert np.abs(p2 - p_ref).max() < 2e-2

    def test_calib_batches_absmax_is_max_over_batches(self, ckpt):
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        rng = np.random.RandomState(2)
        dim = [rng.randint(0, 40, (20, 20), np.uint8) for _ in range(4)]
        bright = [rng.randint(200, 255, (20, 20), np.uint8) for _ in range(4)]
        # dim batch first, bright second: accumulated absmax must cover the
        # bright batch (equal to calibrating on bright alone at the input)
        eng = InferenceEngine(ckpt, batch_size=4, quant=True,
                              calib_batches=2)
        eng.predict_images(dim + bright)
        only_bright = InferenceEngine(ckpt, batch_size=4, quant=True)
        only_bright.predict_images(bright)
        for k, v in only_bright._calib_absmax.items():
            assert eng._calib_absmax[k] >= v - 1e-6

    def test_short_run_stays_full_precision(self, ckpt):
        """Fewer batches than --calib-batches: never swaps, serves the fp
        folded graph throughout (documented behavior, not an error)."""
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        rng = np.random.RandomState(3)
        imgs = [rng.randint(0, 255, (20, 20), np.uint8) for _ in range(4)]
        eng = InferenceEngine(ckpt, batch_size=4, quant=True,
                              calib_batches=5)
        ref = InferenceEngine(ckpt, batch_size=4)
        p = eng.predict_images(imgs)
        assert not eng._quant_ready
        np.testing.assert_array_equal(p, ref.predict_images(imgs))

    def test_cli_surface_has_calib_batches(self):
        from ifcb_classifier_tpu.cli import argparse_nn
        args = argparse_nn().parse_args(
            ["--precision", "int8", "RUN", "src", "model", "rid",
             "--calib-batches", "3"])
        assert args.calib_batches == 3


class TestPinnedCalibration:
    """RUN --precision int8 --calib DIR (VERDICT r4 next #3): activation
    scales frozen to a fixed sample at engine build — deployment scores no
    longer depend on whichever bin arrives first."""

    @pytest.fixture()
    def ckpt(self, tmp_path):
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        model = get_namebrand_model("resnet18", 2)
        params, stats = _randomized_variables(model, jax.random.PRNGKey(3),
                                              32)
        p = str(tmp_path / "m.ptl")
        save_checkpoint(p, params, stats,
                        dict(MODEL="resnet18", classes=["a", "b"], resize=32,
                             model_id="m", seed=1, img_norm=None))
        return p

    @pytest.fixture()
    def calib_dir(self, tmp_path):
        d = tmp_path / "calib"
        write_bin(str(d), "D20250101T000000_IFCB900",
                  [make_roi(20, 24, seed=9), make_roi(16, 16, seed=10)], 2)
        return str(d)

    def test_ready_before_first_dispatch(self, ckpt, calib_dir):
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        eng = InferenceEngine(ckpt, batch_size=4, quant=True,
                              calib_src=calib_dir)
        assert eng._quant_ready and eng._calib_absmax
        assert eng.calib_src == calib_dir

    def test_arrival_order_invariant(self, ckpt, calib_dir):
        """Two pinned services fed DIFFERENT first batches score a shared
        workload identically; two lazily-calibrated services do not — the
        exact cross-service drift the flag exists to remove."""
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        rng = np.random.RandomState(0)
        dim = [rng.randint(0, 40, (20, 20), np.uint8) for _ in range(4)]
        bright = [rng.randint(200, 255, (20, 20), np.uint8)
                  for _ in range(4)]
        shared = [rng.randint(0, 255, (18 + i, 22 - i), np.uint8)
                  for i in range(4)]

        def service(first, calib_src=None):
            eng = InferenceEngine(ckpt, batch_size=4, quant=True,
                                  calib_src=calib_src)
            eng.predict_images(first)  # service A saw dim first, B bright
            return eng.predict_images(shared)

        # lazy first-arrival calibration: the two services disagree
        lazy_a = service(dim)
        lazy_b = service(bright)
        assert np.abs(lazy_a - lazy_b).max() > 0
        # pinned to the same DIR: byte-identical scores
        pin_a = service(dim, calib_src=calib_dir)
        pin_b = service(bright, calib_src=calib_dir)
        np.testing.assert_array_equal(pin_a, pin_b)

    def test_calib_without_int8_is_refused(self, ckpt, calib_dir):
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        with pytest.raises(ValueError, match="only meaningful with"):
            InferenceEngine(ckpt, batch_size=4, calib_src=calib_dir)

    def test_calib_with_calib_batches_is_refused(self, ckpt, calib_dir):
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        with pytest.raises(ValueError, match="pick one"):
            InferenceEngine(ckpt, batch_size=4, quant=True,
                            calib_src=calib_dir, calib_batches=2)

    def test_empty_calib_dir_fails_loudly(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        empty = tmp_path / "nope"
        empty.mkdir()
        with pytest.raises(ValueError, match="no bins or images"):
            InferenceEngine(ckpt, batch_size=4, quant=True,
                            calib_src=str(empty))

    def test_cli_surface_and_from_args(self, ckpt, calib_dir):
        from ifcb_classifier_tpu.cli import argparse_nn
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        args = argparse_nn().parse_args(
            ["--batch", "4", "--precision", "int8", "RUN", "src", ckpt,
             "rid", "--calib", calib_dir, "--calib-count", "16"])
        assert args.calib == calib_dir and args.calib_count == 16
        eng = InferenceEngine.from_args(args)
        assert eng._quant_ready  # pinned at build through the CLI path

    def test_unsupported_family_fails_loudly(self, tmp_path):
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        model = get_namebrand_model("squeezenet", 2)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)},
                       jnp.zeros((1, 32, 32, 3)), train=True)
        p = str(tmp_path / "s.ptl")
        save_checkpoint(p, v["params"], v.get("batch_stats", {}),
                        dict(MODEL="squeezenet", classes=["a", "b"],
                             resize=32, model_id="s", seed=1, img_norm=None))
        with pytest.raises(ValueError, match="int8"):
            InferenceEngine(p, batch_size=4, quant=True)

    def test_train_rejects_int8(self):
        from ifcb_classifier_tpu.utils.config import resolve_dtype
        with pytest.raises(ValueError, match="RUN only"):
            resolve_dtype("int8")


class TestQuantService:
    """int8 under the service paths: watch-mode do_run calibrates once on
    the first bin and keeps serving subsequent arrivals quantized; gobig
    routes through the same _dispatch hook."""

    def test_watch_mode_serves_int8(self, tmp_path, monkeypatch):
        import argparse
        import os
        import time as real_time

        from ifcb_classifier_tpu.infer import runner
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint

        model = get_namebrand_model("resnet18", 2)
        params, stats = _randomized_variables(model, jax.random.PRNGKey(5),
                                              32)
        ck = str(tmp_path / "m.ptl")
        save_checkpoint(ck, params, stats,
                        dict(MODEL="resnet18", classes=["a", "b"], resize=32,
                             model_id="m", seed=1, img_norm=None))
        root = tmp_path / "bins"
        write_bin(str(root), "D20240401T000000_IFCB900",
                  [make_roi(16, 20, 1), make_roi(10, 10, 2)], 2)

        class FakeTime:
            def __init__(self):
                self.sleeps = 0

            def time(self):
                return real_time.time() + 1e6  # everything quiescent

            def sleep(self, s):
                self.sleeps += 1
                if self.sleeps == 1:  # second bin arrives mid-service
                    write_bin(str(root), "D20240402T000000_IFCB900",
                              [make_roi(12, 12, 3)], 2)

        monkeypatch.setattr(runner, "time", FakeTime())
        out = str(tmp_path / "out")
        args = argparse.Namespace(
            cmd_mode="RUN", SRC=str(root), MODEL=ck, RUN_ID="r",
            batch_size=8, loaders=1, src_type="bin", outdir=out,
            outfile=["{BIN_ID}.json"], filter=None, clobber=False,
            gobig=False, cmd_timestamp="2026-08-16T00:00:00+00:00",
            watch=0.01, watch_passes=3, precision="int8")
        runner.do_run(args)
        assert sorted(os.listdir(out)) == ["D20240401T000000_IFCB900.json",
                                           "D20240402T000000_IFCB900.json"]

    def test_watch_composes_with_pinned_calib(self, tmp_path, monkeypatch):
        """--watch + --precision int8 --calib DIR: the long-lived service
        shape the pinning flag exists for. The engine must be int8-ready
        BEFORE the first pass (no first-arrival dependence) and the
        service must produce the same outputs as the lazy arm."""
        import argparse
        import os

        from ifcb_classifier_tpu.infer import runner
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint

        model = get_namebrand_model("resnet18", 2)
        params, stats = _randomized_variables(model, jax.random.PRNGKey(5),
                                              32)
        ck = str(tmp_path / "m.ptl")
        save_checkpoint(ck, params, stats,
                        dict(MODEL="resnet18", classes=["a", "b"], resize=32,
                             model_id="m", seed=1, img_norm=None))
        root = tmp_path / "bins"
        write_bin(str(root), "D20240501T000000_IFCB900",
                  [make_roi(16, 20, 1), make_roi(10, 10, 2)], 2)
        calib = tmp_path / "calib"
        write_bin(str(calib), "D20240502T000000_IFCB900",
                  [make_roi(18, 18, 7)], 2)

        built = {}
        orig = InferenceEngine.from_args.__func__

        def spy(cls, args):
            eng = orig(cls, args)
            built["engine"] = eng
            # captured at BUILD time, before any bin was dispatched
            built["ready_at_build"] = eng._quant_ready
            return eng

        monkeypatch.setattr(InferenceEngine, "from_args",
                            classmethod(spy))
        out = str(tmp_path / "out")
        args = argparse.Namespace(
            cmd_mode="RUN", SRC=str(root), MODEL=ck, RUN_ID="r",
            batch_size=8, loaders=1, src_type="bin", outdir=out,
            outfile=["{BIN_ID}.json"], filter=None, clobber=False,
            gobig=False, cmd_timestamp="2026-08-16T00:00:00+00:00",
            watch=0.01, watch_passes=1, watch_settle=0.0,
            precision="int8", calib=str(calib))
        runner.do_run(args)
        assert built["ready_at_build"]  # pinned BEFORE the first pass
        assert built["engine"].calib_src == str(calib)
        assert os.listdir(out) == ["D20240501T000000_IFCB900.json"]

    def test_gobig_serves_int8_scores_match_per_bin(self, tmp_path):
        """The high-throughput deployment combination: --gobig + --precision
        int8 in ONE run. Cross-bin batches route through the same lazy-
        calibration _dispatch hook. Scores agree with a per-bin int8 run at
        the standard PTQ gate but not bitwise: lazy calibration sees a
        DIFFERENT first batch (gobig packs ROIs across bins; per-bin sees
        bin 1 alone), so the frozen activation scales differ slightly —
        pin scales with EXPORT --precision int8 --calib when bit-stability
        across serving modes matters."""
        import argparse
        import json as _json

        from ifcb_classifier_tpu.infer import runner
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint

        model = get_namebrand_model("resnet18", 2)
        params, stats = _randomized_variables(model, jax.random.PRNGKey(6),
                                              32)
        ck = str(tmp_path / "m.ptl")
        save_checkpoint(ck, params, stats,
                        dict(MODEL="resnet18", classes=["a", "b"], resize=32,
                             model_id="m", seed=1, img_norm=None))
        root = tmp_path / "bins"
        pids = [f"D2024041{i}T000000_IFCB900" for i in (1, 2, 3)]
        for i, p in enumerate(pids):
            write_bin(str(root), p,
                      [make_roi(16, 20, i), make_roi(10, 10, i + 3)], 2)

        def run(out, gobig):
            runner.do_run(argparse.Namespace(
                cmd_mode="RUN", SRC=str(root), MODEL=ck, RUN_ID="r",
                batch_size=8, loaders=1, src_type="bin", outdir=out,
                outfile=["{BIN_ID}.json"], filter=None, clobber=False,
                gobig=gobig, cmd_timestamp="2026-08-16T00:00:00+00:00",
                precision="int8"))

        run(str(tmp_path / "go"), True)
        run(str(tmp_path / "per"), False)
        import os
        for p in pids:
            a = _json.load(open(os.path.join(tmp_path, "go", p + ".json")))
            b = _json.load(open(os.path.join(tmp_path, "per", p + ".json")))
            sa = np.asarray(a["output_scores"])
            sb = np.asarray(b["output_scores"])
            assert (sa.argmax(1) == sb.argmax(1)).all()
            np.testing.assert_allclose(sa, sb, atol=2e-2)


class TestResidentGraph:
    """int8-RESIDENT graphs (models/quant_graph.py for inception,
    models/quant_resnet.py for resnets): activations stay s8 between
    convs. Same quantization points as the interceptor graph, so the two
    int8 variants must agree with each other and with fp32 at the
    standard PTQ gate."""

    def _all(self, size=75, n=5, batch=4, family="inception_v3"):
        import os

        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.models import quant as Q
        from ifcb_classifier_tpu.models.fold import fold_params
        from ifcb_classifier_tpu.train.state import make_predict_step

        model = get_namebrand_model(family, n)
        params, stats = _randomized_variables(model, jax.random.PRNGKey(1),
                                              size)
        fparams, fstats = fold_params(family, params, stats)
        fmodel = get_namebrand_model(family, n, fold_bn=True)
        x = jax.random.uniform(jax.random.PRNGKey(2), (batch, size, size, 3))
        probs_f = np.asarray(make_predict_step(fmodel)(fparams, fstats, x))

        out = {}
        old = os.environ.get("IFCBNN_QUANT_RESIDENT")
        try:
            for tag, env in (("resident", "1"), ("interceptor", "0")):
                os.environ["IFCBNN_QUANT_RESIDENT"] = env
                calib_fn, geoms = Q.make_calib_fn(fmodel)
                absmax = {k: float(v) for k, v in jax.device_get(
                    jax.jit(calib_fn)(fparams, fstats, x)).items()}
                pruned, qconv = Q.quantize_params(fparams, geoms)
                pruned["__quant__"] = qconv
                predict = Q.make_quant_predict(fmodel, absmax, geoms)
                out[tag] = (np.asarray(jax.jit(predict)(pruned, fstats, x)),
                            qconv, pruned)
        finally:
            if old is None:
                os.environ.pop("IFCBNN_QUANT_RESIDENT", None)
            else:
                os.environ["IFCBNN_QUANT_RESIDENT"] = old
        return probs_f, out

    def test_resident_matches_fp32_and_interceptor(self):
        probs_f, out = self._all()
        pr, qconv_r, _ = out["resident"]
        pi, qconv_i, _ = out["interceptor"]
        # same conv set quantized (every non-grouped conv incl. stem)
        assert set(qconv_r) == set(qconv_i)
        assert len(qconv_r) == 94
        # PTQ gate vs fp32 (the same 2e-2 gate the generic tier uses)
        assert float(np.abs(pr - probs_f).max()) < 2e-2
        assert (pr.argmax(-1) == probs_f.argmax(-1)).all()
        # the two int8 graphs share quantization points — they must agree
        # much tighter with each other than the PTQ gate
        assert float(np.abs(pr - pi).max()) < 5e-3
        assert (pr.argmax(-1) == pi.argmax(-1)).all()

    def test_resident_prunes_every_conv(self):
        _, out = self._all(size=75, batch=2)
        _, qconv, pruned = out["resident"]
        # only the head (fc) keeps float weights in the pruned tree
        leaves = jax.tree_util.tree_leaves_with_path(
            {k: v for k, v in pruned.items() if k != "__quant__"})
        paths = {"/".join(p.key for p in path) for path, _ in leaves}
        assert paths == {"fc/kernel", "fc/bias"}, paths
        # weights stored once, int8, per-channel scales
        leaf = qconv["Mixed_5b/branch1x1/conv"]
        assert leaf["w_int8"].dtype == np.int8
        assert leaf["w_scale"].shape == (64,)

    @pytest.mark.parametrize("family,n_convs",
                             [("resnet18", 20), ("resnet50", 53)])
    def test_resident_resnet_matches_fp32_and_interceptor(self, family,
                                                          n_convs):
        """Both block kinds (basic incl. plain-identity adds, bottleneck
        incl. downsample shortcuts) through models/quant_resnet.py. The
        resident graph's shortcut is s8 by design (the interceptor adds
        the bf16 tensor — see the quant_resnet docstring), so the
        vs-interceptor gate is looser than inception's; the PRODUCT gate
        (vs fp32, same as the generic tier) and argmax identity hold."""
        probs_f, out = self._all(size=64, family=family)
        pr, qconv_r, pruned = out["resident"]
        pi, qconv_i, _ = out["interceptor"]
        assert set(qconv_r) == set(qconv_i)
        assert len(qconv_r) == n_convs
        assert float(np.abs(pr - probs_f).max()) < 2e-2
        assert (pr.argmax(-1) == probs_f.argmax(-1)).all()
        assert float(np.abs(pr - pi).max()) < 3e-2
        assert (pr.argmax(-1) == pi.argmax(-1)).all()
        leaves = jax.tree_util.tree_leaves_with_path(
            {k: v for k, v in pruned.items() if k != "__quant__"})
        paths = {"/".join(p.key for p in path) for path, _ in leaves}
        assert paths == {"fc/kernel", "fc/bias"}, paths

    def test_resident_vgg_matches_fp32_and_interceptor(self):
        """vgg11_bn through models/quant_vgg.py — a pure conv chain, so
        the quantization points are the interceptor's exactly (tight
        agreement like inception's)."""
        probs_f, out = self._all(size=224, batch=2, family="vgg11_bn")
        pr, qconv_r, pruned = out["resident"]
        pi, qconv_i, _ = out["interceptor"]
        assert set(qconv_r) == set(qconv_i)
        assert len(qconv_r) == 8
        assert float(np.abs(pr - probs_f).max()) < 2e-2
        assert (pr.argmax(-1) == probs_f.argmax(-1)).all()
        assert float(np.abs(pr - pi).max()) < 5e-3
        assert (pr.argmax(-1) == pi.argmax(-1)).all()
        # classifier Denses stay full precision in the pruned tree
        leaves = jax.tree_util.tree_leaves_with_path(
            {k: v for k, v in pruned.items() if k != "__quant__"})
        paths = {"/".join(p.key for p in path) for path, _ in leaves}
        assert paths == {"classifier_0/kernel", "classifier_0/bias",
                         "classifier_3/kernel", "classifier_3/bias",
                         "classifier_6/kernel", "classifier_6/bias"}, paths
