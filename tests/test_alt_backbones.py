"""BASELINE config #3: alternate backbones (densenet121, efficientnet_b0)
through the full TRAIN pipeline with dataset-normalization stats — exercises
BN-in-dense-blocks, SE blocks, stochastic depth, and dropout RNG threading
end to end."""

import csv
import os

import numpy as np
import pytest

from fixtures import write_image_folder_dataset
from test_train_loop import make_args


@pytest.mark.parametrize("backbone", ["densenet121", "efficientnet_b0"])
def test_alt_backbone_trains(tmp_path, backbone):
    os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
    try:
        src = write_image_folder_dataset(str(tmp_path / "ds"),
                                         {"a": 8, "b": 8}, size=(24, 24))
        outdir = str(tmp_path / backbone)
        args = make_args(src, outdir, MODEL=backbone, emax=1, seed=6,
                         img_norm=["0.5,0.5,0.5", "0.25,0.25,0.25"])
        from ifcb_classifier_tpu.train.loop import do_training
        ckpt = do_training(args)
        assert os.path.isfile(ckpt)
        with open(os.path.join(outdir, "epochs.csv")) as f:
            rows = list(csv.DictReader(f))
        assert np.isfinite(float(rows[0]["train_loss"]))
        assert np.isfinite(float(rows[0]["val_loss"]))

        # and RUN from the produced artifact
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        import jax.numpy as jnp
        engine = InferenceEngine(ckpt, batch_size=8, dtype=jnp.float32)
        assert engine.hparams["MODEL"] == backbone
        rng = np.random.default_rng(0)
        probs = engine.predict_images(
            [rng.integers(0, 256, (20, 20), np.uint8) for _ in range(3)])
        np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-4)
    finally:
        os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)
