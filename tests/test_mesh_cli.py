"""--mesh DATA[xMODEL] surface (VERDICT r2 weak#5): tensor parallelism must
be reachable from the product CLI, not just from tests/dryrun. Real
subprocess invocations on a 4x2 mesh over 8 virtual CPU devices."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixtures import make_roi, write_bin, write_image_folder_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# PALLAS_AXON_POOL_IPS="" keeps the axon (TPU tunnel) backend out of the
# children entirely — JAX_PLATFORMS=cpu alone is only honored when the
# tunnel claim happens to fail (racy; see test_entrypoints.py)
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
           XLA_FLAGS="--xla_force_host_platform_device_count=8",
           IFCBNN_RESIZE_OVERRIDE="32", PALLAS_AXON_POOL_IPS="")


def test_parse_mesh_specs():
    from ifcb_classifier_tpu.utils.config import parse_mesh
    assert parse_mesh(None, 8) == (8, 1)
    assert parse_mesh("auto", 4) == (4, 1)
    assert parse_mesh("4x2", 8) == (4, 2)
    assert parse_mesh("8", 8) == (8, 1)
    with pytest.raises(ValueError, match="devices"):
        parse_mesh("4x2", 4)
    with pytest.raises(ValueError, match="DATAxMODEL"):
        parse_mesh("4xx2", 8)
    with pytest.raises(ValueError, match="devices"):
        parse_mesh("2", 1)  # single chip, over-asking must fail loudly


def test_cli_train_then_run_on_4x2_mesh(tmp_path):
    src = write_image_folder_dataset(str(tmp_path / "ds"),
                                     {"a": 8, "b": 8}, size=(24, 24))
    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "ifcb_classifier_tpu", "--batch", "8",
         "--mesh", "4x2", "TRAIN", src, "resnet18", "t1",
         "--emax", "1", "--estop", "0", "--seed", "1", "--outdir", out],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Mesh: 4 data-parallel x 2 model-parallel" in r.stdout
    ck = os.path.join(out, "t1.ptl")
    assert os.path.isfile(ck)

    bins = tmp_path / "bins"
    write_bin(str(bins), "D20250601T000000_IFCB900",
              [make_roi(16, 20, 1), make_roi(10, 10, 2)], 2)
    run_out = str(tmp_path / "run")
    r = subprocess.run(
        [sys.executable, "-m", "ifcb_classifier_tpu", "--batch", "8",
         "--mesh", "4x2", "RUN", str(bins), ck, "r1",
         "--outdir", run_out, "--outfile", "{BIN_ID}.json"],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    res = json.load(open(os.path.join(run_out,
                                      "D20250601T000000_IFCB900.json")))
    assert res["roi_numbers"] == [1, 2]


def test_engine_tp_scores_match_dp(tmp_path):
    """A 4x2 engine must score identically (≤1e-4) to the default 8x1
    engine — the TP all-gather is a layout change, not a math change."""
    import jax
    import jax.numpy as jnp
    from ifcb_classifier_tpu.infer.runner import InferenceEngine
    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
    from ifcb_classifier_tpu.train.state import create_train_state

    model = get_namebrand_model("resnet18", 4, dtype=jnp.float32)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), 32)
    ck = str(tmp_path / "m.ptl")
    save_checkpoint(ck, state.params, state.batch_stats,
                    dict(MODEL="resnet18", classes=list("abcd"), resize=32,
                         model_id="m", seed=1, img_norm=None))
    imgs = [make_roi(20, 24, i) for i in range(6)]
    p_dp = InferenceEngine(ck, batch_size=8).predict_images(imgs)
    p_tp = InferenceEngine(ck, batch_size=8, mesh="4x2").predict_images(imgs)
    np.testing.assert_allclose(p_tp, p_dp, atol=1e-4)


def test_mesh_process_divisibility_fails_before_dataset_walk(tmp_path,
                                                             monkeypatch):
    """BOTH non-divisible directions must die in the pre-scan fail-fast
    block (the round-4 review found n_data > n_proc slipped through to the
    post-walk check): SRC here doesn't even exist, so reaching the dataset
    scan would raise something other than the --mesh ValueError."""
    import argparse
    import jax
    from ifcb_classifier_tpu.train.loop import do_training

    monkeypatch.setattr(jax, "process_count", lambda: 6)
    args = argparse.Namespace(
        cmd_timestamp="2026-08-20T00:00:00+00:00", model_id="m",
        TRAIN_ID="t", outdir=str(tmp_path / "out"),
        SRC=str(tmp_path / "does-not-exist"), mesh="8x1")
    with pytest.raises(ValueError, match="--mesh 8x1"):
        do_training(args)       # n_data=8 > n_proc=6, 6 % 8 != 0
    args.mesh = "4x2"
    with pytest.raises(ValueError, match="--mesh 4x2"):
        do_training(args)       # n_data=4 < n_proc=6, 6 % 4 != 0
    args.mesh = "2x4"           # 2 divides 6: replica groups — must PASS
    with pytest.raises(Exception) as ei:  # ...the gate, then die on SRC
        do_training(args)
    assert "--mesh" not in str(ei.value)
