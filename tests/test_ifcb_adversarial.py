"""Adversarial IFCB parser corpus (VERDICT r4 next #4).

Systematic malformed-input coverage for the first-party bin reader
(data/ifcb.py — the pyifcb-replacement parsing surface the reference
consumes via neuston_data.py:14-16,446-453) and the native canvas packer
(native/roipack.cpp + its numpy fallback). Contract for every case:
raise loudly or flag the ROI — never hang, never emit garbage pixels,
never read out of bounds.

Cases: truncated .roi, out-of-range / overlapping byte spans, zero /
negative / overflow-scale ADC dims, NaN / inf / empty fields, binary and
wrong-encoding .adc, non-UTF8 .hdr, empty and missing files.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ifcb_classifier_tpu import native  # noqa: E402
from ifcb_classifier_tpu.data.ifcb import Bin, parse_adc  # noqa: E402
from fixtures import make_roi, write_bin  # noqa: E402

PID = "D20240101T000000_IFCB101"


def _write_raw(tmp_path, adc_text=None, roi_bytes=None, hdr_bytes=b"k: v\n",
               adc_bytes=None):
    """A bin fileset with raw control over every file's bytes."""
    base = os.path.join(str(tmp_path), PID)
    with open(base + ".adc", "wb") as f:
        f.write(adc_bytes if adc_bytes is not None
                else adc_text.encode())
    with open(base + ".roi", "wb") as f:
        f.write(roi_bytes if roi_bytes is not None else b"")
    with open(base + ".hdr", "wb") as f:
        f.write(hdr_bytes)
    return Bin(base + ".adc")


def _v2_row(trigger=1, w=0, h=0, start=0):
    """One schema-2 ADC CSV row with the geometry fields filled."""
    vals = [0] * 24
    vals[0] = trigger
    vals[15], vals[16], vals[17] = w, h, start
    return ",".join(str(v) for v in vals)


class TestAdcFieldCorruption:
    def test_nan_field_raises(self, tmp_path):
        b = _write_raw(tmp_path, adc_text=_v2_row(w=8, h=8).replace(
            "8", "nan", 1) + "\n", roi_bytes=b"\0" * 64)
        with pytest.raises(Exception):
            b.adc

    def test_inf_field_raises(self, tmp_path):
        row = _v2_row(w=8, h=8, start=0).split(",")
        row[17] = "inf"  # startByte = inf
        b = _write_raw(tmp_path, adc_text=",".join(row) + "\n",
                       roi_bytes=b"\0" * 64)
        with pytest.raises(Exception):
            b.adc

    def test_empty_geometry_field_raises(self, tmp_path):
        row = _v2_row(w=8, h=8).split(",")
        row[16] = ""  # roiHeight empty -> NaN in the C parser
        b = _write_raw(tmp_path, adc_text=",".join(row) + "\n",
                       roi_bytes=b"\0" * 64)
        with pytest.raises(Exception):
            b.adc

    def test_ragged_short_row_raises(self, tmp_path):
        b = _write_raw(tmp_path, adc_text="1,2,3\n", roi_bytes=b"")
        with pytest.raises(Exception):
            b.adc

    def test_binary_garbage_adc_raises(self, tmp_path):
        b = _write_raw(tmp_path, adc_bytes=bytes(range(256)) * 8,
                       roi_bytes=b"")
        with pytest.raises(Exception):
            b.adc

    def test_utf16_encoded_adc_raises(self, tmp_path):
        text = _v2_row(w=4, h=4) + "\n"
        b = _write_raw(tmp_path, adc_bytes=text.encode("utf-16"),
                       roi_bytes=b"\0" * 16)
        with pytest.raises(Exception):
            b.adc

    def test_non_numeric_field_raises(self, tmp_path):
        row = _v2_row(w=4, h=4).split(",")
        row[15] = "four"
        b = _write_raw(tmp_path, adc_text=",".join(row) + "\n",
                       roi_bytes=b"\0" * 16)
        with pytest.raises(Exception):
            b.adc


class TestRoiByteRanges:
    def test_truncated_roi_file_raises(self, tmp_path):
        base = write_bin(str(tmp_path), PID, [make_roi(10, 10)])
        with open(base + ".roi", "r+b") as f:
            f.truncate(40)  # claims 100 bytes
        with pytest.raises(ValueError, match="outside the .roi file"):
            Bin(base + ".adc").images

    def test_startbyte_past_eof_raises(self, tmp_path):
        b = _write_raw(tmp_path, adc_text=_v2_row(w=4, h=4, start=999) + "\n",
                       roi_bytes=b"\0" * 16)
        with pytest.raises(ValueError, match="outside the .roi file"):
            b.image(1)

    def test_negative_startbyte_raises_not_wraps(self, tmp_path):
        # -16 would wrap via Python negative indexing to a VALID 16-byte
        # slice of the wrong pixels — must raise instead
        b = _write_raw(tmp_path, adc_text=_v2_row(w=4, h=4, start=-16) + "\n",
                       roi_bytes=b"\0" * 64)
        with pytest.raises(ValueError, match="outside the .roi file"):
            b.image(1)

    def test_overflow_scale_dims_raise_not_wrap(self, tmp_path):
        # h*w ~ 2^62: must hit the bounds check, not allocate or wrap
        b = _write_raw(
            tmp_path,
            adc_text=_v2_row(w=2**31, h=2**31, start=0) + "\n",
            roi_bytes=b"\0" * 64)
        with pytest.raises(ValueError, match="outside the .roi file"):
            b.image(1)

    def test_zero_and_negative_dims_are_imageless_rows(self, tmp_path):
        # zero/negative dims are the instrument's "no image" convention —
        # excluded from target_numbers, KeyError on direct access, and
        # NEVER a garbage ROI
        rows = [_v2_row(trigger=1, w=0, h=0),
                _v2_row(trigger=2, w=-4, h=4),
                _v2_row(trigger=3, w=4, h=-4),
                _v2_row(trigger=4, w=4, h=4, start=0)]
        b = _write_raw(tmp_path, adc_text="\n".join(rows) + "\n",
                       roi_bytes=b"\7" * 16)
        assert b.target_numbers() == [4]
        for t in (1, 2, 3):
            with pytest.raises(KeyError):
                b.image(t)
        assert b.image(4).shape == (4, 4)

    def test_overlapping_spans_are_bounded_aliases(self, tmp_path):
        # overlapping byte spans can't be distinguished from intentional
        # reuse — they are tolerated, but every returned pixel must come
        # from inside the file (zero-copy views alias the same buffer)
        rows = [_v2_row(trigger=1, w=4, h=4, start=0),
                _v2_row(trigger=2, w=4, h=4, start=8)]
        payload = bytes(range(24))
        b = _write_raw(tmp_path, adc_text="\n".join(rows) + "\n",
                       roi_bytes=payload)
        imgs = b.images
        assert imgs[1].shape == (4, 4) and imgs[2].shape == (4, 4)
        np.testing.assert_array_equal(imgs[1].ravel(),
                                      np.frombuffer(payload[:16], np.uint8))
        np.testing.assert_array_equal(imgs[2].ravel(),
                                      np.frombuffer(payload[8:], np.uint8))


class TestEmptyAndMissingFiles:
    def test_empty_adc_is_an_empty_bin(self, tmp_path):
        # zero-trigger bins occur in real deployments: valid, just empty
        b = _write_raw(tmp_path, adc_text="", roi_bytes=b"")
        assert len(b) == 0 and b.images == {}

    def test_empty_roi_with_claiming_adc_raises(self, tmp_path):
        b = _write_raw(tmp_path, adc_text=_v2_row(w=4, h=4) + "\n",
                       roi_bytes=b"")
        with pytest.raises(ValueError, match="outside the .roi file"):
            b.images

    def test_missing_roi_file_raises(self, tmp_path):
        b = _write_raw(tmp_path, adc_text=_v2_row(w=4, h=4) + "\n",
                       roi_bytes=b"\0" * 16)
        os.unlink(b.roi_path)
        with pytest.raises(FileNotFoundError):
            b.images

    def test_non_utf8_hdr_never_crashes(self, tmp_path):
        b = _write_raw(tmp_path, adc_text="", roi_bytes=b"",
                       hdr_bytes=b"\xff\xfe\x80inst: IFCB\xff\n\x00: x\n")
        hdr = b.headers  # errors='replace' decode; must not raise
        assert isinstance(hdr, dict)

    def test_missing_hdr_is_empty_headers(self, tmp_path):
        b = _write_raw(tmp_path, adc_text="", roi_bytes=b"")
        os.unlink(b.hdr_path)
        assert b.headers == {}


def _pack_both_paths(monkeypatch_none, roi, starts, hs, ws, B=8, S=16):
    """Run pack_rois_native through the requested implementation."""
    return native.pack_rois_native(
        np.frombuffer(roi, np.uint8), np.asarray(starts, np.int64),
        np.asarray(hs, np.int64), np.asarray(ws, np.int64), B, S)


@pytest.fixture(params=["native", "numpy"])
def pack_impl(request, monkeypatch):
    """Both packer implementations must satisfy the same flag contract."""
    if request.param == "native":
        if not native.available():
            pytest.skip("native roipack unavailable (no compiler)")
    else:
        monkeypatch.setattr(native, "_load", lambda: None)
    return request.param


class TestNativePackerCorpus:
    def test_out_of_range_span_flagged(self, pack_impl):
        canvas, sizes = _pack_both_paths(None, b"\1" * 32, [0, 24], [4, 4],
                                         [4, 4])
        assert tuple(sizes[0]) == (4, 4)
        assert tuple(sizes[1]) == (0, 0)  # 24+16 > 32: flagged, not read

    def test_negative_start_flagged(self, pack_impl):
        _, sizes = _pack_both_paths(None, b"\1" * 32, [-8], [2], [2])
        assert tuple(sizes[0]) == (0, 0)

    def test_zero_and_negative_dims_flagged(self, pack_impl):
        _, sizes = _pack_both_paths(None, b"\1" * 32, [0, 0, 0],
                                    [0, -3, 3], [3, 3, -3])
        assert [tuple(s) for s in sizes[:3]] == [(0, 0)] * 3

    def test_int64_overflow_dims_flagged(self, pack_impl):
        # h*w wraps int64 (2^32 * 2^33 = 2^65): the overflow-safe division
        # check must flag it; a naive s0+h*w bound would wrap NEGATIVE and
        # pass, then memcpy terabytes out of bounds
        _, sizes = _pack_both_paths(None, b"\1" * 32, [0], [2**32], [2**33])
        assert tuple(sizes[0]) == (0, 0)

    def test_start_at_exact_eof_flagged(self, pack_impl):
        _, sizes = _pack_both_paths(None, b"\1" * 32, [32], [1], [1])
        assert tuple(sizes[0]) == (0, 0)

    def test_good_rois_unaffected_by_bad_neighbors(self, pack_impl):
        roi = bytes(range(48))
        canvas, sizes = _pack_both_paths(None, roi, [0, 999, 16],
                                         [4, 4, 4], [4, 4, 4])
        assert tuple(sizes[0]) == (4, 4)
        assert tuple(sizes[1]) == (0, 0)
        assert tuple(sizes[2]) == (4, 4)
        np.testing.assert_array_equal(
            canvas[0, :4, :4].ravel(), np.frombuffer(roi[:16], np.uint8))
        np.testing.assert_array_equal(
            canvas[2, :4, :4].ravel(), np.frombuffer(roi[16:32], np.uint8))
        assert not canvas[1].any()  # flagged row stays zeroed

    def test_more_rois_than_batch_is_refused(self, pack_impl):
        with pytest.raises(AssertionError, match="exceed batch_size"):
            _pack_both_paths(None, b"\1" * 64, [0] * 9, [2] * 9, [2] * 9,
                             B=8)


class TestParseAdcDirect:
    def test_v1_and_v2_column_maps(self, tmp_path):
        # geometry fields land in the right columns for BOTH schemas
        for schema in (1, 2):
            base = write_bin(str(tmp_path / f"s{schema}"),
                             PID if schema == 2 else "IFCB1_2024_001_000000",
                             [make_roi(6, 5)], schema=schema)
            adc = parse_adc(base + ".adc", schema)
            assert adc["roiHeight"][0] == 6 and adc["roiWidth"][0] == 5
            assert adc["startByte"][0] == 0

    def test_whitespace_only_file_is_empty(self, tmp_path):
        p = tmp_path / "x.adc"
        p.write_text("\n   \n\t\n")
        adc = parse_adc(str(p), 2)
        assert len(adc["trigger"]) == 0
