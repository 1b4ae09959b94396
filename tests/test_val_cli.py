"""VAL verb: offline evaluation of a saved model on a labeled dataset
(train/evaluate.py — beyond-reference addition, QUIRKS.md). The contract
under test: TRAIN-comparable metrics (same eval step, preprocess, writer),
loud class-mismatch failures, and the result-file surface."""

import argparse
import csv
import json
import os
import shutil

import numpy as np
import pytest

from fixtures import write_image_folder_dataset
from test_train_loop import make_args


def val_args(src, model, outdir, **kw):
    d = dict(cmd_mode="VAL", SRC=src, MODEL=model, VAL_ID="v1",
             batch_size=8, loaders=1, precision="fp32", outdir=outdir,
             class_config=None, class_min=1, class_max=None,
             args_log="args.yml",
             result_files=[["val_results.json"]],
             cmd_timestamp="2026-08-20T00:00:00+00:00")
    d.update(kw)
    return argparse.Namespace(**d)


@pytest.fixture(scope="module")
def trained_for_val(tmp_path_factory):
    os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
    root = tmp_path_factory.mktemp("valtrain")
    src = write_image_folder_dataset(str(root / "ds"),
                                     {"a": 10, "b": 10}, size=(24, 20))
    outdir = str(root / "out")
    from ifcb_classifier_tpu.train.loop import do_training
    do_training(make_args(src, outdir, emax=1, seed=11))
    os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)
    return src, outdir, os.path.join(outdir, "tt.ptl")


class TestValBasics:
    def test_evaluates_and_writes_results(self, trained_for_val, tmp_path):
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            src, _, ckpt = trained_for_val
            vout = str(tmp_path / "val")
            from ifcb_classifier_tpu.train.evaluate import do_validation
            summary = do_validation(val_args(
                src, ckpt, vout,
                result_files=[["val_results.json"],
                              ["res_{epoch}.mat", "confusion_matrix",
                               "f1_perclass"]]))
            assert summary["n_images"] == 20
            assert 0.0 <= summary["f1_weighted"] <= 1.0
            d = json.load(open(os.path.join(vout, "val_results.json")))
            assert d["model_id"] == "v1"
            assert len(d["input_classes"]) == 20
            assert len(d["output_scores"]) == 20
            # no training set in an offline evaluation
            assert d["training_image_basenames"] == []
            assert os.path.isfile(os.path.join(vout, "res_VAL.mat"))
            assert os.path.isfile(os.path.join(vout, "args.yml"))
            assert os.path.isfile(os.path.join(vout,
                                               "validation_images.list"))
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)

    def test_f1_basis_matches_train_on_partial_class_coverage(
            self, trained_for_val, tmp_path):
        """VAL on a SRC containing only SOME checkpoint classes: the
        printed/returned f1 must use sklearn's default labels basis (like
        TRAIN's epochs.csv f1) — a fixed range(len(classes)) basis counted
        every absent checkpoint class as 0.0 and silently deflated the
        macro average, breaking the TRAIN-comparability contract."""
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            src, _, ckpt = trained_for_val
            sub = str(tmp_path / "subset")
            os.makedirs(sub)
            shutil.copytree(os.path.join(src, "a"),
                            os.path.join(sub, "a"))  # class b absent
            vout = str(tmp_path / "val")
            from ifcb_classifier_tpu.train.evaluate import do_validation
            summary = do_validation(val_args(sub, ckpt, vout))
            d = json.load(open(os.path.join(vout, "val_results.json")))
            from sklearn.metrics import f1_score
            y = np.asarray(d["input_classes"])
            yhat = np.argmax(np.asarray(d["output_scores"]), 1)
            # TRAIN's exact basis (train/loop.py): sklearn default labels
            assert summary["f1_macro"] == pytest.approx(
                f1_score(y, yhat, average="macro"))
            assert summary["f1_weighted"] == pytest.approx(
                f1_score(y, yhat, average="weighted"))
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)

    def test_scores_match_trains_own_validation(self, trained_for_val,
                                                tmp_path):
        """Pin VAL to TRAIN's validation exactly: evaluating the images of
        the TRAIN run's validation split must reproduce TRAIN's per-image
        output_scores (same model, same preprocess, both flip-free)."""
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            src, outdir, ckpt = trained_for_val
            val_list = open(os.path.join(
                outdir, "validation_images.list")).read().splitlines()
            vsrc = tmp_path / "valset"
            for p in val_list:  # rebuild a folder-per-class tree
                cls = os.path.basename(os.path.dirname(p))
                os.makedirs(vsrc / cls, exist_ok=True)
                shutil.copy(p, vsrc / cls / os.path.basename(p))
            from ifcb_classifier_tpu.train.evaluate import do_validation
            vout = str(tmp_path / "val")
            do_validation(val_args(str(vsrc), ckpt, vout))
            ours = json.load(open(os.path.join(vout, "val_results.json")))
            theirs = json.load(open(os.path.join(outdir, "results.json")))
            by_name = dict(zip(theirs["image_basenames"],
                               theirs["output_scores"]))
            assert set(ours["image_basenames"]) == set(by_name)
            for name, scores in zip(ours["image_basenames"],
                                    ours["output_scores"]):
                np.testing.assert_allclose(scores, by_name[name], atol=2e-5)
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)

    def test_unknown_class_dies_loudly(self, trained_for_val, tmp_path):
        src, _, ckpt = trained_for_val
        src2 = tmp_path / "ds2"
        shutil.copytree(src, src2)
        os.rename(src2 / "a", src2 / "zz_new_species")
        from ifcb_classifier_tpu.train.evaluate import do_validation
        with pytest.raises(ValueError, match="zz_new_species"):
            do_validation(val_args(str(src2), ckpt,
                                   str(tmp_path / "val")))

    def test_class_config_maps_new_names(self, trained_for_val, tmp_path):
        """--class-config merges/renames SRC folders onto the checkpoint's
        classes (same CSV semantics as TRAIN)."""
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            src, _, ckpt = trained_for_val
            src2 = tmp_path / "ds2"
            shutil.copytree(src, src2)
            os.rename(src2 / "a", src2 / "a_renamed")
            cfg = tmp_path / "cc.csv"
            cfg.write_text("orig,run1\na_renamed,a\nb,b\n")
            from ifcb_classifier_tpu.train.evaluate import do_validation
            vout = str(tmp_path / "val")
            s = do_validation(val_args(str(src2), ckpt, vout,
                                       class_config=[str(cfg), "run1"]))
            assert s["n_images"] == 20
            d = json.load(open(os.path.join(vout, "val_results.json")))
            assert sorted(set(d["class_labels"])) == ["a", "b"]
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)

    def test_empty_src_dies_loudly(self, trained_for_val, tmp_path):
        _, _, ckpt = trained_for_val
        empty = tmp_path / "empty"
        os.makedirs(empty / "a")  # class folder with zero images
        from ifcb_classifier_tpu.train.evaluate import do_validation
        with pytest.raises((ValueError, AssertionError)):
            do_validation(val_args(str(empty), ckpt,
                                   str(tmp_path / "val")))

    def test_results_placeholder_typo_fails_before_inference(
            self, trained_for_val, tmp_path, monkeypatch):
        """TRAIN's fail-fast rule applies to VAL too: a typo'd --results
        placeholder dies at startup, not after the whole evaluation."""
        src, _, ckpt = trained_for_val
        import ifcb_classifier_tpu.data.datasets as ds_mod
        scanned = {"n": 0}
        orig = ds_mod.NeustonDataset.__init__
        def counting(self, *a, **kw):
            scanned["n"] += 1
            return orig(self, *a, **kw)
        monkeypatch.setattr(ds_mod.NeustonDataset, "__init__", counting)
        from ifcb_classifier_tpu.train.evaluate import do_validation
        with pytest.raises(ValueError, match="placeholder"):
            do_validation(val_args(
                src, ckpt, str(tmp_path / "val"),
                result_files=[["res_{epch}.json"]]))
        assert scanned["n"] == 0  # failed before the dataset scan

    def test_multihost_nonzero_rank_idles(self, trained_for_val, tmp_path,
                                          monkeypatch):
        """Single-file output contract (like RUN --type img): in a fleet
        only process 0 evaluates — other ranks must idle, not race-write
        the same result files with duplicate inference."""
        import jax
        src, _, ckpt = trained_for_val
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        monkeypatch.setattr(jax, "process_index", lambda: 2)
        from ifcb_classifier_tpu.train.evaluate import do_validation
        vout = str(tmp_path / "val")
        assert do_validation(val_args(src, ckpt, vout)) is None
        assert not os.path.exists(vout)  # nothing written on this rank

    def test_cli_parses_val(self):
        from ifcb_classifier_tpu.cli import argparse_nn
        a = argparse_nn().parse_args(
            ["--batch", "16", "VAL", "srcdir", "m.ptl", "vid",
             "--outdir", "o", "--results", "r.json", "f1_perclass"])
        assert a.cmd_mode == "VAL" and a.VAL_ID == "vid"
        assert a.batch_size == 16 and a.class_min == 1
        assert a.result_files == [["r.json", "f1_perclass"]]

    def test_outdir_templating(self):
        from ifcb_classifier_tpu.utils.config import proc_outdir
        args = argparse.Namespace(cmd_mode="VAL", VAL_ID="myval",
                                  outdir="val-output/{VAL_ID}",
                                  cmd_timestamp="2026-08-20T00:00:00+00:00")
        proc_outdir(args)
        assert args.outdir == "val-output/myval"
