"""End-to-end learning correctness: on a linearly separable synthetic dataset
(classes = distinct dominant colors), the full TRAIN pipeline must actually
learn — validation F1 near 1.0 within a few epochs. Guards against silent
breakage anywhere in decode→pack→resize→normalize→model→loss→update."""

import csv
import os

import numpy as np

from test_train_loop import make_args


def write_color_dataset(root, n_per_class=16, size=(30, 24)):
    from PIL import Image
    rng = np.random.default_rng(0)
    colors = {"reddish": (200, 40, 40), "greenish": (40, 200, 40),
              "bluish": (40, 40, 200)}
    for cls, base in colors.items():
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_class):
            noise = rng.normal(0, 15, size=(size[0], size[1], 3))
            arr = np.clip(np.asarray(base) + noise, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{cls}_{i:02d}.png"))
    return root


def test_learns_separable_classes(tmp_path):
    os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
    try:
        src = write_color_dataset(str(tmp_path / "ds"))
        outdir = str(tmp_path / "out")
        # batch rounds to 16 under the 8-device test mesh -> 3 updates/epoch
        # (39 train imgs), 18 updates over 6 epochs — plenty for separable
        # colors and enough steps for BN running stats to settle
        args = make_args(src, outdir, emax=6, emin=1, estop=0, seed=1,
                         batch_size=12)
        from ifcb_classifier_tpu.train.loop import do_training
        do_training(args)
        with open(os.path.join(outdir, "epochs.csv")) as f:
            rows = list(csv.DictReader(f))
        best_f1 = max(float(r["f1_weighted"]) for r in rows)
        assert best_f1 > 0.85, f"failed to learn separable classes: {best_f1}"
    finally:
        os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)
