"""Docs-rot guard: the README Quick-start commands must run VERBATIM in
shape (same positional order, same flag spellings) — only the data is
synthetic, plus a small --batch/--emax so the documented inception_v3
config (full 299 input — its aux head admits nothing smaller) finishes in
CPU test time. If a CLI surface changes, this fails before a user's
copy-paste does."""

import glob
import os
import subprocess
import sys

import pytest

from fixtures import make_roi, write_bin, write_image_folder_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               # README commands run from the repo root; the test cwd is a
               # scratch dir so data paths stay relative like the docs show
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    return env


def _run(cmd, cwd):
    r = subprocess.run([sys.executable, "-m"] + cmd, cwd=cwd, env=_env(),
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (cmd, r.stdout[-800:], r.stderr[-800:])
    return r


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("quickstart")
    src = write_image_folder_dataset(str(root / "training-data"),
                                     {"a": 6, "b": 6, "c": 6})
    bins = str(root / "bins")
    write_bin(bins, "D20240501T000000_IFCB900",
              [make_roi(20, 24, i) for i in range(4)], 2)
    with open(root / "config.csv", "w") as f:
        f.write("class,col1\na,1\nb,1\nc,keepme\n")
    return root, src, bins


def test_quickstart_commands_run_verbatim(corpus, tmp_path):
    root, src, bins = corpus
    cwd = str(root)

    # train (same CLI shape as the reference's neuston_net.py)
    _run(["ifcb_classifier_tpu", "--batch", "8", "TRAIN", "training-data",
          "inception_v3", "MyModel", "--flip", "xy",
          "--class-config", "config.csv", "col1",
          "--seed", "42", "--emax", "1", "--estop", "0"], cwd)
    ptl = glob.glob(os.path.join(cwd, "training-output", "**", "MyModel.ptl"),
                    recursive=True)
    assert ptl, "TRAIN did not produce the documented artifact path"

    # classify raw IFCB bins — writes D{YEAR}/D{DATE}/{BIN_ID}_class.h5
    _run(["ifcb_classifier_tpu", "--batch", "8", "RUN", bins, ptl[0],
          "MyRun"], cwd)
    h5 = glob.glob(os.path.join(cwd, "run-output", "**", "D2024", "**",
                                "*_class.h5"), recursive=True)
    assert h5, "RUN did not write the documented per-bin h5 layout"

    # classify an image folder
    _run(["ifcb_classifier_tpu", "--batch", "8", "RUN", src, ptl[0],
          "MyImgRun", "--type", "img"], cwd)
    assert glob.glob(os.path.join(cwd, "run-output", "**",
                                  "img_results.json"), recursive=True)

    # evaluate on a labeled dataset (VAL; training-data is merged by the
    # same class-config the model was trained with)
    _run(["ifcb_classifier_tpu", "--batch", "8", "VAL", "training-data",
          ptl[0], "MyEval", "--class-config", "config.csv", "col1"], cwd)
    assert glob.glob(os.path.join(cwd, "val-output", "**",
                                  "val_results.json"), recursive=True)

    # utilities
    _run(["ifcb_classifier_tpu.util_cli", "CALC_IMG_NORM", "training-data"],
         cwd)
    _run(["ifcb_classifier_tpu.util_cli", "MAKE_CLASS_CONFIG",
          "training-data", "-o", "cfg.csv"], cwd)
    assert os.path.isfile(os.path.join(cwd, "cfg.csv"))

    # StableHLO artifact
    _run(["ifcb_classifier_tpu.export", "EXPORT", ptl[0]], cwd)
    assert glob.glob(os.path.splitext(ptl[0])[0] + "*.stablehlo")

    # SLURM wrapper (dry run renders without submitting)
    _run(["ifcb_classifier_tpu.sbatch", "--dry-run", "TRAIN",
          "training-data", "inception_v3", "MyModel2",
          "--outdir", str(tmp_path)], cwd)
    assert glob.glob(os.path.join(str(tmp_path), "*.sbatch"))
