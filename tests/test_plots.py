"""Plot-file surface — the reference's reserved-but-TODO `-p/--plot FNAME
PARAM...` flag (neuston_net.py:379,413,455), implemented here. Covers the
panel renderers, the TRAIN best-epoch firing + {epoch} templating, and the
RUN per-bin vs aggregate split."""

import argparse
import os

import numpy as np
import pytest

from fixtures import make_roi, write_bin, write_image_folder_dataset

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _assert_png(path):
    assert os.path.isfile(path), path
    with open(path, "rb") as f:
        assert f.read(8) == PNG_MAGIC
    assert os.path.getsize(path) > 1000  # not a blank stub


def _epoch_rows(n=3):
    return [dict(epoch=e, best=(e == n - 1), train_loss=3.0 - e,
                 val_loss=2.5 - e * 0.7, f1_macro=0.3 + 0.2 * e,
                 f1_weighted=0.4 + 0.2 * e) for e in range(n)]


class TestTrainingPlotRenderer:
    def test_all_params_one_figure(self, tmp_path):
        from ifcb_classifier_tpu.results.plots import (TRAIN_PLOT_PARAMS,
                                                       save_training_plots)
        rng = np.random.default_rng(0)
        scores = rng.dirichlet(np.ones(4), size=30)
        out = str(tmp_path / "all.png")
        save_training_plots(out, TRAIN_PLOT_PARAMS, epoch_rows=_epoch_rows(),
                            class_labels=list("abcd"),
                            input_classes=rng.integers(0, 4, 30),
                            output_scores=scores,
                            counts_perclass=[5, 10, 7, 8],
                            model_id="m", epoch=2)
        _assert_png(out)

    def test_default_params(self, tmp_path):
        from ifcb_classifier_tpu.results.plots import save_training_plots
        out = str(tmp_path / "d.png")
        save_training_plots(out, [], epoch_rows=_epoch_rows(1),
                            class_labels=["a", "b"],
                            input_classes=[0, 1, 1],
                            output_scores=[[.9, .1], [.2, .8], [.6, .4]],
                            counts_perclass=[2, 1])
        _assert_png(out)

    def test_other_formats(self, tmp_path):
        from ifcb_classifier_tpu.results.plots import save_training_plots
        for ext in ("pdf", "svg"):
            out = str(tmp_path / ("p." + ext))
            save_training_plots(out, ["curves"], epoch_rows=_epoch_rows(2),
                                class_labels=["a"], input_classes=[0],
                                output_scores=[[1.0]], counts_perclass=[1])
            assert os.path.getsize(out) > 300

    def test_unknown_param_rejected(self, tmp_path):
        from ifcb_classifier_tpu.results.plots import save_training_plots
        with pytest.raises(ValueError, match="unknown plot param"):
            save_training_plots(str(tmp_path / "x.png"), ["bogus"],
                                epoch_rows=[], class_labels=["a"],
                                input_classes=[0], output_scores=[[1.0]],
                                counts_perclass=[1])

    def test_many_classes_top_n_truncation(self, tmp_path):
        # 60 classes > _MAX_BAR_CLASSES: bar charts/heatmap must still render
        from ifcb_classifier_tpu.results.plots import save_training_plots
        rng = np.random.default_rng(1)
        n_cls = 60
        scores = rng.dirichlet(np.ones(n_cls), size=120)
        out = str(tmp_path / "many.png")
        save_training_plots(out, ["confusion", "perclass_recall"],
                            epoch_rows=_epoch_rows(1),
                            class_labels=[f"c{i}" for i in range(n_cls)],
                            input_classes=rng.integers(0, n_cls, 120),
                            output_scores=scores,
                            counts_perclass=rng.integers(1, 9, n_cls).tolist())
        _assert_png(out)


class TestRunPlotRenderer:
    def test_counts_and_scores(self, tmp_path):
        from ifcb_classifier_tpu.results.plots import save_run_plots
        out = str(tmp_path / "r.png")
        save_run_plots(out, [], class_labels=["a", "b", "c"],
                       output_classes=[0, 0, 2, 1, 2],
                       winscores=[.9, .8, .5, .99, .6], title="bin X")
        _assert_png(out)

    def test_unknown_param_rejected(self, tmp_path):
        from ifcb_classifier_tpu.results.plots import save_run_plots
        with pytest.raises(ValueError, match="unknown plot param"):
            save_run_plots(str(tmp_path / "x.png"), ["confusion"],
                           class_labels=["a"], output_classes=[0],
                           winscores=[1.0])


class TestTrainPlotWiring:
    def test_best_epoch_plots_with_epoch_template(self, tmp_path):
        from test_train_loop import make_args
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            src = write_image_folder_dataset(
                str(tmp_path / "ds"), {"a": 8, "b": 8}, size=(36, 28))
            outdir = str(tmp_path / "out")
            args = make_args(src, outdir, emax=2, plot_files=[
                ["plots_{epoch}.png", "curves", "confusion"],
                ["latest.png"]])
            from ifcb_classifier_tpu.train.loop import do_training
            do_training(args)
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)
        made = [f for f in os.listdir(outdir) if f.endswith(".png")]
        # epoch 0 is always a best epoch; later bests add more files
        assert any(f.startswith("plots_") for f in made)
        _assert_png(os.path.join(outdir, sorted(
            f for f in made if f.startswith("plots_"))[0]))
        _assert_png(os.path.join(outdir, "latest.png"))


class TestRunPlotWiring:
    @pytest.fixture(scope="class")
    def ckpt(self, tmp_path_factory):
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        from ifcb_classifier_tpu.train.state import create_train_state
        model = get_namebrand_model("resnet18", 2, dtype=jnp.float32)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), 32)
        p = str(tmp_path_factory.mktemp("ck") / "m.ptl")
        save_checkpoint(p, state.params, state.batch_stats,
                        dict(MODEL="resnet18", classes=["a", "b"], resize=32,
                             model_id="m", seed=1, img_norm=None))
        return p

    def _args(self, src, ckpt, outdir, **kw):
        d = dict(cmd_mode="RUN", SRC=src, MODEL=ckpt, RUN_ID="r",
                 batch_size=8, loaders=1, src_type="bin", outdir=outdir,
                 outfile=["{BIN_ID}.json"], filter=None, clobber=False,
                 gobig=False, cmd_timestamp="2026-08-16T00:00:00+00:00")
        d.update(kw)
        return argparse.Namespace(**d)

    def test_perbin_and_aggregate(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        root = tmp_path / "bins"
        for i in (1, 2):
            write_bin(str(root), f"D2024020{i}T000000_IFCB900",
                      [make_roi(16, 20, i), make_roi(10, 10, i + 3)], 2)
        out = str(tmp_path / "out")
        do_run(self._args(str(root), ckpt, out, plot_files=[
            ["{BIN_ID}_plot.png", "counts"], ["summary.png"]]))
        _assert_png(os.path.join(out, "D20240201T000000_IFCB900_plot.png"))
        _assert_png(os.path.join(out, "D20240202T000000_IFCB900_plot.png"))
        _assert_png(os.path.join(out, "summary.png"))

    def test_img_mode_aggregate(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        src = write_image_folder_dataset(str(tmp_path / "imgs"), {"a": 4},
                                         size=(30, 30))
        out = str(tmp_path / "out")
        do_run(self._args(src, ckpt, out, src_type="img",
                          outfile=["img_results.json"],
                          plot_files=[["summary.png", "scores"]]))
        _assert_png(os.path.join(out, "summary.png"))

    def test_img_mode_rejects_bin_patterns(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        src = write_image_folder_dataset(str(tmp_path / "imgs"), {"a": 3},
                                         size=(30, 30))
        with pytest.raises(ValueError, match="not .*available"):
            do_run(self._args(src, ckpt, str(tmp_path / "out"),
                              src_type="img", outfile=["img_results.json"],
                              plot_files=[["{BIN_ID}.png"]]))


class TestPlotValidation:
    def test_unsupported_extension_fails_at_startup(self):
        """A typo'd extension (or a params-as-fname slip like
        `--plot counts`) must fail BEFORE any compute — render-time
        discovery killed a TRAIN at its first best epoch."""
        import pytest
        from ifcb_classifier_tpu.results.plots import validate_plot_files
        with pytest.raises(ValueError, match="unsupported figure ext"):
            validate_plot_files([["plots.pgn", "counts"]], which="run")
        with pytest.raises(ValueError, match="unsupported figure ext"):
            validate_plot_files([["counts"]], which="run")  # no fname
        with pytest.raises(ValueError, match="unsupported figure ext"):
            validate_plot_files([["curves.csv", "curves"]], which="train")
        # every documented-good format still passes
        validate_plot_files([["a.png", "counts"], ["b.pdf", "scores"],
                             ["c.svg", "counts"]], which="run")
        validate_plot_files([["{epoch}.png", "curves"]], which="train")


class TestPlotCLI:
    def test_train_and_run_parse(self):
        from ifcb_classifier_tpu.cli import argparse_nn
        p = argparse_nn()
        a = p.parse_args(["TRAIN", "src", "resnet18", "id",
                          "--plot", "plots.png", "curves", "confusion",
                          "-p", "f1.pdf", "f1"])
        assert a.plot_files == [["plots.png", "curves", "confusion"],
                                ["f1.pdf", "f1"]]
        a = p.parse_args(["RUN", "src", "m.ptl", "rid",
                          "-p", "{BIN_ID}.png", "counts"])
        assert a.plot_files == [["{BIN_ID}.png", "counts"]]
