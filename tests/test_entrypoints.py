"""Subprocess smoke tests for every CLI entry point (the user-facing surface
the reference exposes as neuston_net/util/onnx/sbatch scripts)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def run(args, **kw):
    return subprocess.run([sys.executable, "-m"] + args, cwd=REPO, env=ENV,
                          capture_output=True, text=True, timeout=120, **kw)


class TestHelpScreens:
    @pytest.mark.parametrize("mod", ["ifcb_classifier_tpu",
                                     "ifcb_classifier_tpu.util_cli",
                                     "ifcb_classifier_tpu.export"])
    def test_help_exits_zero(self, mod):
        r = run([mod, "--help"])
        assert r.returncode == 0, r.stderr

    def test_train_help_lists_reference_flags(self):
        r = run(["ifcb_classifier_tpu", "TRAIN", "--help"])
        for flag in ["--untrain", "--img-norm", "--seed", "--split",
                     "--class-config", "--class-min", "--class-max", "--emax",
                     "--emin", "--estop", "--flip", "--outdir", "--model-id",
                     "--epochs-log", "--args-log", "--onnx", "--results"]:
            assert flag in r.stdout, flag

    def test_run_help_lists_reference_flags(self):
        r = run(["ifcb_classifier_tpu", "RUN", "--help"])
        for flag in ["--type", "--outdir", "--outfile", "--filter", "--clobber"]:
            assert flag in r.stdout, flag

    def test_missing_subcommand_errors(self):
        r = run(["ifcb_classifier_tpu"])
        assert r.returncode != 0
        assert "TRAIN" in r.stderr and "RUN" in r.stderr


class TestSbatchDryRun:
    def test_renders_script_without_submitting(self, tmp_path):
        r = subprocess.run(
            [sys.executable, "-m", "ifcb_classifier_tpu.sbatch", "--dry-run",
             "--job-name", "tj", "--walltime", "01:00:00",
             "TRAIN", "srcdir", "resnet18", "tid",
             "--outdir", str(tmp_path)],
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        script = tmp_path / "xxxxxx.tj.sbatch"
        assert script.exists()
        content = script.read_text()
        assert "#SBATCH --job-name=tj" in content
        assert "#SBATCH --time=01:00:00" in content
        assert "python -m ifcb_classifier_tpu TRAIN srcdir resnet18 tid" \
            in content
        assert "SRUN Command:" in r.stdout


class TestSbatchRunOutdir:
    def test_run_mode_resolves_outdir_placeholders(self, tmp_path):
        """RUN-mode sbatch must resolve {RUN_ID}/{MODEL_ID} like the
        reference (neuston_net.py:438-444) — no literal-brace directories."""
        out_pat = str(tmp_path / "run-output" / "{RUN_ID}" / "{MODEL_ID}")
        r = subprocess.run(
            [sys.executable, "-m", "ifcb_classifier_tpu.sbatch", "--dry-run",
             "--job-name", "rj",
             "RUN", str(tmp_path / "bins"), str(tmp_path / "model.ptl"),
             "myrun", "--outdir", out_pat],
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        resolved = tmp_path / "run-output" / "myrun" / "model"
        assert resolved.is_dir()  # fallback MODEL_ID = ckpt file stem
        assert not (tmp_path / "run-output" / "{RUN_ID}").exists()
