"""Unit tests for the turnkey accuracy-parity harness's comparator
(tools/accuracy_parity.py). The full chain (PORT → TRAIN → RUN → compare)
is exercised by `python tools/accuracy_parity.py --demo` on the TPU host —
measured 100% top-1 agreement / 9e-6 score MAE on the synthetic corpus
(BASELINE.md); these tests cover the comparison logic itself on CPU.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def _result(bin_id, rois, scores, labels=("a", "b", "c")):
    return dict(bin_id=bin_id, roi_numbers=np.asarray(rois, np.int64),
                scores=np.asarray(scores, np.float32),
                class_labels=list(labels))


class TestCompare:
    def test_perfect_agreement(self):
        from accuracy_parity import compare
        s = [[0.8, 0.1, 0.1], [0.2, 0.7, 0.1]]
        ours = {"B1": _result("B1", [1, 2], s)}
        report, ok = compare(ours, {"B1": _result("B1", [1, 2], s)}, 0.995)
        assert ok and report["top1_agreement"] == 1.0
        assert report["score_mae"] == 0.0 and report["rois_compared"] == 2

    def test_disagreement_fails_gate(self):
        from accuracy_parity import compare
        ours = {"B1": _result("B1", [1, 2],
                              [[0.8, 0.1, 0.1], [0.2, 0.7, 0.1]])}
        ref = {"B1": _result("B1", [1, 2],
                             [[0.8, 0.1, 0.1], [0.6, 0.3, 0.1]])}
        report, ok = compare(ours, ref, 0.995)
        assert not ok and report["top1_agreement"] == 0.5
        assert report["score_max_abs_delta"] == pytest.approx(0.4, abs=1e-6)

    def test_missing_bin_fails(self):
        from accuracy_parity import compare
        s = [[1.0, 0.0, 0.0]]
        ours = {"B1": _result("B1", [1], s)}
        ref = {"B1": _result("B1", [1], s), "B2": _result("B2", [1], s)}
        report, ok = compare(ours, ref, 0.995)
        assert not ok and report["bins_missing_from_ours"] == ["B2"]

    def test_roi_alignment_by_number_not_order(self):
        from accuracy_parity import compare
        ours = {"B1": _result("B1", [2, 1],
                              [[0.1, 0.9, 0.0], [0.9, 0.1, 0.0]])}
        ref = {"B1": _result("B1", [1, 2],
                             [[0.9, 0.1, 0.0], [0.1, 0.9, 0.0]])}
        report, ok = compare(ours, ref, 0.995)
        assert ok and report["top1_agreement"] == 1.0


class TestLoadResultFile:
    def test_h5_round_trip_through_run_writer(self, tmp_path):
        from accuracy_parity import load_result_file

        from ifcb_classifier_tpu.data.ifcb import Pid
        from ifcb_classifier_tpu.results.run import save_run_results
        pid = Pid("D20230101T120000_IFCB111")
        probs = np.asarray([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]], np.float32)
        inputs = [pid.with_target(t) for t in (1, 2)]
        save_run_results(inputs, probs, ["a", "b", "c"],
                         "2026-01-01T00:00:00+00:00", str(tmp_path),
                         "{BIN_ID}_class.h5", "m", pid)
        r = load_result_file(str(tmp_path / "D20230101T120000_IFCB111_class.h5"))
        assert r["class_labels"] == ["a", "b", "c"]
        assert r["roi_numbers"].tolist() == [1, 2]
        np.testing.assert_allclose(r["scores"], probs, atol=1e-3)  # f16 file
