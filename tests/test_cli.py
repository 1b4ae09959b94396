"""CLI surface parity tests: the reference's neuston_net.py flag surface must
parse identically here (flags, defaults, subcommands)."""

import pytest

from ifcb_classifier_tpu.cli import argparse_nn


@pytest.fixture(scope="module")
def parser():
    return argparse_nn()


class TestTrainSurface:
    def test_reference_defaults(self, parser):
        a = parser.parse_args(["TRAIN", "src", "inception_v3", "tid"])
        assert a.batch_size == 108            # neuston_net.py:324
        assert a.loaders == 4                 # :325
        assert a.pretrained is True           # :340
        assert a.seed == 0                    # :348
        assert a.split == "80:20"             # :349
        assert a.class_min == 2               # :351
        assert a.class_max is None            # :352
        assert a.emax == 60 and a.emin == 10 and a.estop == 10  # :358-360
        assert a.outdir == "training-output/{TRAIN_ID}"          # :367
        assert a.model_id == "{TRAIN_ID}"                        # :368
        assert a.epochs_log == "epochs.csv"                      # :369
        assert a.args_log == "args.yml"                          # :370
        assert a.onnx is False

    def test_reference_invocation_verbatim(self, parser):
        """A realistic reference command line parses unchanged."""
        a = parser.parse_args(
            ["--batch", "64", "--loaders", "8", "TRAIN", "training-data",
             "inception_v3", "MyModel", "--flip", "xy+V", "--seed", "42",
             "--split", "70:30", "--class-config", "cfg.csv", "col1",
             "--img-norm", "0.667", "0.161", "--emax", "30",
             "--results", "results.json", "image_basenames", "output_scores",
             "--results", "results.mat", "confusion_matrix",
             "--model-id", "{TRAIN_DATE}_{TRAIN_ID}", "--onnx", "--untrain"])
        assert a.batch_size == 64 and a.flip == "xy+V"
        assert a.class_config == ["cfg.csv", "col1"]
        assert a.img_norm == ["0.667", "0.161"]
        assert a.result_files == [
            ["results.json", "image_basenames", "output_scores"],
            ["results.mat", "confusion_matrix"]]
        assert a.pretrained is False

    def test_flip_choices(self, parser):
        for good in ["x", "y", "xy", "x+V", "y+V", "xy+V"]:
            parser.parse_args(["TRAIN", "s", "m", "t", "--flip", good])
        with pytest.raises(SystemExit):
            parser.parse_args(["TRAIN", "s", "m", "t", "--flip", "z"])


class TestRunSurface:
    def test_reference_defaults(self, parser):
        a = parser.parse_args(["RUN", "src", "model.ptl", "rid"])
        assert a.src_type == "bin"                                   # :399
        assert a.outdir == "run-output/{RUN_ID}/v3/{MODEL_ID}"       # :400
        assert a.outfile is None and a.clobber is False

    def test_filter_and_outfile(self, parser):
        a = parser.parse_args(
            ["RUN", "src", "m.ptl", "r", "--type", "img",
             "--outfile", "a.json", "--outfile", "b.mat",
             "--filter", "IN", "kw1", "kw2", "--clobber", "--gobig"])
        assert a.outfile == ["a.json", "b.mat"]
        assert a.filter == ["IN", "kw1", "kw2"]
        assert a.clobber and a.gobig

    def test_type_choices(self, parser):
        with pytest.raises(SystemExit):
            parser.parse_args(["RUN", "s", "m", "r", "--type", "wav"])


class TestUtilSurface:
    def test_util_subcommands(self):
        from ifcb_classifier_tpu.util_cli import argparse_util
        p = argparse_util()
        a = p.parse_args(["CALC_IMG_NORM", "src", "--resize", "224"])
        assert a.resize == 224 and a.class_min == 2
        a = p.parse_args(["MAKE_DATASET_CONFIG", "1:ds1", "ds2", "-o", "o.csv"])
        assert a.dataset == ["1:ds1", "ds2"]
        a = p.parse_args(["MAKE_CLASS_CONFIG", "ds"])
        assert a.dataset == "ds"

    def test_sbatch_dry_run_flags(self):
        from ifcb_classifier_tpu.sbatch import argparse_sbatch
        from ifcb_classifier_tpu.cli import argparse_nn as nn_parser
        p = nn_parser(argparse_sbatch())
        a = p.parse_args(["--dry-run", "--walltime", "02:00:00",
                         "TRAIN", "s", "resnet18", "t"])
        assert a.dry_run and a.walltime == "02:00:00"
        assert a.cmd_mode == "TRAIN"
