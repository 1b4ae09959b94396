"""The product pipelines (TRAIN loop, InferenceEngine) on the 8-device
virtual mesh — verifies the automatic DP wiring, not just the bare steps."""

import argparse
import csv
import json
import os

import numpy as np

from fixtures import make_roi, write_bin, write_image_folder_dataset
from test_train_loop import make_args


def test_training_loop_dp8(tmp_path):
    import jax
    assert len(jax.devices()) >= 8
    os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
    try:
        src = write_image_folder_dataset(str(tmp_path / "ds"),
                                         {"a": 10, "b": 10}, size=(20, 20))
        outdir = str(tmp_path / "out")
        # batch 10 -> rounded up to 16 for 8 devices
        args = make_args(src, outdir, emax=2, batch_size=10, seed=2)
        from ifcb_classifier_tpu.train.loop import do_training
        ckpt = do_training(args)
        assert args.batch_size == 16
        assert os.path.isfile(ckpt)
        with open(os.path.join(outdir, "epochs.csv")) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2
        assert all(np.isfinite(float(r["val_loss"])) for r in rows)
    finally:
        os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)


def test_inference_engine_dp8(tmp_path):
    import jax
    import jax.numpy as jnp
    from ifcb_classifier_tpu.infer.runner import InferenceEngine
    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
    from ifcb_classifier_tpu.train.state import create_train_state

    model = get_namebrand_model("squeezenet", 3, dtype=jnp.float32)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), 224)
    ckpt = str(tmp_path / "m.ptl")
    save_checkpoint(ckpt, state.params, state.batch_stats,
                    dict(MODEL="squeezenet", classes=["a", "b", "c"],
                         resize=224, model_id="m", seed=1, img_norm=None))

    base = write_bin(str(tmp_path), "D20240301T000000_IFCB900",
                     [make_roi(20 + i, 30, i) for i in range(10)], 2)
    from ifcb_classifier_tpu.data.ifcb import Bin
    engine = InferenceEngine(ckpt, batch_size=6, dtype=jnp.float32)
    assert engine.batch_size == 8  # rounded up for 8 devices
    targets, probs = engine.predict_bin(Bin(base + ".adc"))
    assert targets == list(range(1, 11))
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-4)

    # sharded result must equal single-device result
    direct = engine.predict_images([make_roi(20 + i, 30, i)
                                    for i in range(10)])
    np.testing.assert_allclose(probs, direct, atol=1e-4)


def test_gobig_aggregator_dp8(tmp_path):
    """Cross-bin gobig batches through the 8-device sharded engine: shared
    batches stay device-divisible (engine rounds batch up; flush pads) and
    per-bin results match the per-bin path."""
    import jax
    import jax.numpy as jnp
    from ifcb_classifier_tpu.data.ifcb import Bin
    from ifcb_classifier_tpu.infer.runner import InferenceEngine
    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
    from ifcb_classifier_tpu.train.state import create_train_state

    model = get_namebrand_model("squeezenet", 3, dtype=jnp.float32)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), 32)
    ckpt = str(tmp_path / "m.ptl")
    save_checkpoint(ckpt, state.params, state.batch_stats,
                    dict(MODEL="squeezenet", classes=["a", "b", "c"],
                         resize=32, model_id="m", seed=1, img_norm=None))
    bins = []
    for b in range(3):
        base = write_bin(str(tmp_path), f"D2024030{b + 2}T000000_IFCB900",
                         [make_roi(18 + i, 22, b * 10 + i) for i in range(5)],
                         2)
        bins.append(Bin(base + ".adc"))

    engine = InferenceEngine(ckpt, batch_size=6, dtype=jnp.float32)
    assert engine.batch_size == 8

    results, errors = {}, []
    agg = engine.gobig(lambda obj, t, p: results.__setitem__(obj, (t, p)),
                       lambda obj, e: errors.append((obj, e)))
    for bn in bins:
        agg.add_bin(bn, bn.pid.pid)
    agg.flush()
    assert not errors
    assert len(results) == 3
    for bn in bins:
        t_ref, p_ref = engine.predict_bin(bn)
        t_agg, p_agg = results[bn.pid.pid]
        assert t_agg == t_ref
        np.testing.assert_allclose(p_agg, p_ref, atol=1e-4)
