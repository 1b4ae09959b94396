"""Pallas fused preprocess kernel — correctness vs the XLA path (interpret
mode on CPU; the same kernel runs compiled on TPU)."""

import numpy as np

from ifcb_classifier_tpu.data.pipeline import pack_canvas_batch
from ifcb_classifier_tpu.ops.pallas_preprocess import preprocess_gray_pallas
from ifcb_classifier_tpu.ops.preprocess import preprocess_batch
from fixtures import make_roi


class TestPallasPreprocess:
    def test_matches_xla_path(self):
        rois = [make_roi(40, 60, 1), make_roi(100, 30, 2), make_roi(8, 8, 3)]
        canvas, sizes, _ = pack_canvas_batch(rois, batch_size=4, rgb=False)
        pal = np.asarray(preprocess_gray_pallas(
            canvas, sizes, out_size=64, interpret=True))
        xla = np.asarray(preprocess_batch(canvas, sizes, out_size=64))
        np.testing.assert_allclose(pal, xla[..., 0], atol=1e-4)

    def test_normalization(self):
        rois = [np.full((16, 16), 128, np.uint8)]
        canvas, sizes, _ = pack_canvas_batch(rois, rgb=False)
        out = np.asarray(preprocess_gray_pallas(
            canvas, sizes, out_size=8, mean=0.5, std=0.25, interpret=True))
        np.testing.assert_allclose(out[0, 4, 4], (128 / 255 - 0.5) / 0.25,
                                   atol=1e-3)
