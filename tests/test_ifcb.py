"""Tests for the first-party IFCB bin reader (data/ifcb.py)."""

import numpy as np
import pytest

from ifcb_classifier_tpu.data.ifcb import (
    Bin, DataDirectory, Pid, SCHEMA_VERSION_1, SCHEMA_VERSION_2, infilled_images,
)
from fixtures import make_roi, write_bin


class TestPid:
    def test_new_style(self):
        p = Pid("D20150101T123456_IFCB101")
        assert p.schema_version == SCHEMA_VERSION_2
        assert p.pid == "D20150101T123456_IFCB101"
        assert p.year == 2015
        assert p.yearday == "20150101"
        assert p.instrument == "IFCB101"
        assert p.target is None

    def test_old_style(self):
        p = Pid("IFCB1_2007_134_123456")
        assert p.schema_version == SCHEMA_VERSION_1
        assert p.year == 2007
        assert p.yearday == "2007_134"
        assert p.instrument == "IFCB1"

    def test_target_suffix(self):
        p = Pid("D20150101T123456_IFCB101_00042")
        assert p.target == 42
        assert p.pid == "D20150101T123456_IFCB101"
        assert str(p) == "D20150101T123456_IFCB101_00042"

    def test_with_target(self):
        p = Pid("D20150101T123456_IFCB101")
        assert p.with_target(7) == "D20150101T123456_IFCB101_00007"

    def test_path_and_extension_stripped(self):
        p = Pid("/some/dir/D20150101T123456_IFCB101.adc")
        assert p.pid == "D20150101T123456_IFCB101"

    def test_invalid(self):
        with pytest.raises(ValueError):
            Pid("not_a_pid")

    def test_namespace_mutable(self):
        p = Pid("D20150101T123456_IFCB101")
        p.namespace = "sub/dir/"
        assert p.namespace == "sub/dir/"


class TestBin:
    def test_roundtrip_v2(self, tmp_path):
        rois = [make_roi(11, 17, 1), None, make_roi(23, 5, 2)]
        base = write_bin(str(tmp_path), "D20200301T000000_IFCB900", rois, schema=2)
        b = Bin(base + ".adc")
        assert b.schema == SCHEMA_VERSION_2
        assert len(b) == 2
        assert b.target_numbers() == [1, 3]
        np.testing.assert_array_equal(b.images[1], rois[0])
        np.testing.assert_array_equal(b.images[3], rois[2])

    def test_roundtrip_v1(self, tmp_path):
        rois = [make_roi(8, 9, 3)]
        base = write_bin(str(tmp_path), "IFCB1_2007_134_123456", rois, schema=1)
        b = Bin(base + ".adc")
        assert b.schema == SCHEMA_VERSION_1
        np.testing.assert_array_equal(b.images[1], rois[0])

    def test_stitching_single_rois_passthrough(self, tmp_path):
        rois = [make_roi(6, 6, 4), make_roi(7, 7, 5)]
        base = write_bin(str(tmp_path), "IFCB1_2007_134_000001", rois, schema=1,
                         trigger_of=[1, 2])
        b = Bin(base + ".adc")
        out = infilled_images(b)
        assert sorted(out) == [1, 2]
        np.testing.assert_array_equal(out[1], rois[0])

    def test_stitching_composites_same_trigger(self, tmp_path):
        r1, r2 = make_roi(6, 4, 6), make_roi(6, 4, 7)
        base = write_bin(str(tmp_path), "IFCB1_2007_134_000002", [r1, r2],
                         schema=1, trigger_of=[1, 1])
        b = Bin(base + ".adc")
        out = infilled_images(b)
        assert list(out) == [1]  # keyed by first target of the group
        stitched = out[1]
        assert stitched.shape == (6, 8)
        np.testing.assert_array_equal(stitched[:, :4], r1)
        np.testing.assert_array_equal(stitched[:, 4:], r2)


class TestDataDirectory:
    def _make_three(self, root):
        write_bin(str(root / "a"), "D20200101T000000_IFCB900", [make_roi(5, 5)], 2)
        write_bin(str(root / "a"), "D20200102T000000_IFCB900", [make_roi(5, 5)], 2)
        write_bin(str(root / "b"), "D20210101T000000_IFCB901", [make_roi(5, 5)], 2)

    def test_discovery_sorted(self, tmp_path):
        self._make_three(tmp_path)
        dd = DataDirectory(str(tmp_path))
        pids = [b.pid.pid for b in dd]
        assert len(dd) == 3
        assert pids == sorted(pids)

    def test_whitelist(self, tmp_path):
        self._make_three(tmp_path)
        dd = DataDirectory(str(tmp_path), whitelist=["D2021"])
        assert [b.pid.pid for b in dd] == ["D20210101T000000_IFCB901"]

    def test_blacklist(self, tmp_path):
        self._make_three(tmp_path)
        dd = DataDirectory(str(tmp_path), blacklist=["IFCB901"])
        assert len(dd) == 2

    def test_keyword_in_search_root_path_does_not_match(self, tmp_path):
        """Filters match the pid and the SRC-relative path, never the
        absolute root: RUN /data/ifcb_test_deploy --filter OUT test must
        not skip every bin."""
        from ifcb_classifier_tpu.data.ifcb import DataDirectory
        root = tmp_path / "ifcb_test_deploy"
        for pid in ("D20240101T000000_IFCB900", "D20240102T000000_IFCB900"):
            write_bin(str(root), pid, [make_roi(5, 5)], 2)
        assert len(DataDirectory(str(root), blacklist=["test"])) == 2
        assert len(DataDirectory(str(root), whitelist=["test"])) == 0
        # relative SUBDIR components still participate
        write_bin(str(root / "testsub"), "D20240103T000000_IFCB900",
                  [make_roi(5, 5)], 2)
        assert len(DataDirectory(str(root), blacklist=["testsub"])) == 2

    def test_exact_whitelist_rejects_prefix_siblings(self, tmp_path):
        """The single-bin / .txt-list paths use exact pid equality: a
        whitelist of ..._IFCB101 must not also classify ..._IFCB1011."""
        from ifcb_classifier_tpu.data.ifcb import DataDirectory
        write_bin(str(tmp_path), "D20240101T000000_IFCB101",
                  [make_roi(5, 5)], 2)
        write_bin(str(tmp_path), "D20240101T000000_IFCB1011",
                  [make_roi(5, 5)], 2)
        dd = DataDirectory(str(tmp_path),
                           whitelist=["D20240101T000000_IFCB101"],
                           exact=True)
        assert [b.pid.pid for b in dd] == ["D20240101T000000_IFCB101"]
        # non-exact (keyword prefilter) keeps substring semantics
        assert len(DataDirectory(str(tmp_path),
                                 whitelist=["IFCB101"])) == 2

    def test_exact_mode_respects_blacklist_and_needs_whitelist(self,
                                                               tmp_path):
        """exact=True used to short-circuit past the blacklist (silently
        classifying excluded bins) and to turn a missing whitelist into a
        silent 0-bin run instead of an error."""
        from ifcb_classifier_tpu.data.ifcb import DataDirectory
        pids = ["D20240101T000000_IFCB101", "D20240102T000000_IFCB101"]
        for p in pids:
            write_bin(str(tmp_path), p, [make_roi(5, 5)], 2)
        dd = DataDirectory(str(tmp_path), whitelist=pids,
                           blacklist=["D20240102"], exact=True)
        assert [b.pid.pid for b in dd] == [pids[0]]
        with pytest.raises(AssertionError, match="requires a whitelist"):
            len(DataDirectory(str(tmp_path), exact=True))

    def test_ignores_orphan_adc(self, tmp_path):
        self._make_three(tmp_path)
        (tmp_path / "D20220101T000000_IFCB900.adc").write_text("0,0\n")
        assert len(DataDirectory(str(tmp_path))) == 3


class TestAdcEdgeCases:
    """Instrument-reality edge cases for the first-party ADC parser
    (pyifcb-replacement robustness; reference got these via pyifcb)."""

    def _cols(self, n):
        from ifcb_classifier_tpu.data.ifcb import ADC_COLUMNS_V2
        return ADC_COLUMNS_V2, len(ADC_COLUMNS_V2)

    def _row(self, trigger, x, y, w, h, start):
        from ifcb_classifier_tpu.data.ifcb import ADC_COLUMNS_V2
        vals = ["0"] * len(ADC_COLUMNS_V2)
        for name, v in [("trigger", trigger), ("roiX", x), ("roiY", y),
                        ("roiWidth", w), ("roiHeight", h),
                        ("startByte", start)]:
            vals[ADC_COLUMNS_V2.index(name)] = str(v)
        return ",".join(vals)

    def test_crlf_and_trailing_blank_lines(self, tmp_path):
        from ifcb_classifier_tpu.data.ifcb import SCHEMA_VERSION_2, parse_adc
        p = str(tmp_path / "a.adc")
        body = "\r\n".join([self._row(1, 0, 0, 4, 5, 0),
                            self._row(2, 1, 1, 3, 3, 20)]) + "\r\n\r\n\r\n"
        open(p, "w", newline="").write(body)
        adc = parse_adc(p, SCHEMA_VERSION_2)
        assert list(adc["roiWidth"]) == [4, 3]
        assert list(adc["startByte"]) == [0, 20]

    def test_scientific_notation_values(self, tmp_path):
        from ifcb_classifier_tpu.data.ifcb import SCHEMA_VERSION_2, parse_adc
        p = str(tmp_path / "a.adc")
        open(p, "w").write(
            self._row("1.000000e+00", 0, 0, "4.0e0", "5.000000e+00",
                      "1.2e+01") + "\n")
        adc = parse_adc(p, SCHEMA_VERSION_2)
        assert list(adc["roiHeight"]) == [5]
        assert list(adc["startByte"]) == [12]

    def test_whitespace_padded_fields(self, tmp_path):
        from ifcb_classifier_tpu.data.ifcb import SCHEMA_VERSION_2, parse_adc
        p = str(tmp_path / "a.adc")
        row = self._row(1, 0, 0, 7, 2, 5).replace(",", " , ")
        open(p, "w").write(row + "\n")
        adc = parse_adc(p, SCHEMA_VERSION_2)
        assert list(adc["roiWidth"]) == [7]

    def test_zero_row_adc_is_empty_bin(self, tmp_path):
        from ifcb_classifier_tpu.data.ifcb import Bin
        base = str(tmp_path / "D20240101T000000_IFCB900")
        open(base + ".adc", "w").write("")
        open(base + ".roi", "wb").write(b"")
        open(base + ".hdr", "w").write("")
        b = Bin(base + ".adc")
        assert len(b.images) == 0

    def test_ragged_row_fails_loudly_not_silently(self, tmp_path):
        """A row with missing columns must raise (so RUN's per-bin trap
        reports it), never silently mis-assign columns."""
        from ifcb_classifier_tpu.data.ifcb import SCHEMA_VERSION_2, parse_adc
        p = str(tmp_path / "a.adc")
        open(p, "w").write("1,2,3\n")  # far fewer columns than the schema
        with pytest.raises(Exception):
            parse_adc(p, SCHEMA_VERSION_2)

    def test_empty_field_fails_loudly_not_int64min(self, tmp_path):
        """An EMPTY field is NaN to the pandas fast path; astype(int64)
        would turn it into INT64_MIN silently — for roiWidth that silently
        DROPS the ROI (looks like a normal zero-width trigger row). It must
        raise instead so RUN's per-bin isolation reports the bin."""
        from ifcb_classifier_tpu.data.ifcb import SCHEMA_VERSION_2, parse_adc
        for field in ("roiWidth", "startByte"):
            p = str(tmp_path / f"empty_{field}.adc")
            good = self._row(1, 0, 0, 4, 5, 0)
            bad = self._row(2, 1, 1, 3, 3, 20)
            from ifcb_classifier_tpu.data.ifcb import ADC_COLUMNS_V2
            cells = bad.split(",")
            cells[ADC_COLUMNS_V2.index(field)] = ""
            open(p, "w").write(good + "\n" + ",".join(cells) + "\n")
            with pytest.raises(ValueError):
                parse_adc(p, SCHEMA_VERSION_2)


class TestRoiByteRangeGuards:
    """Bin.image validates ROI byte ranges against the .roi file so corrupt
    bins fail loudly (trapped per-bin by RUN) instead of wrapping through
    Python negative indexing into silently-wrong pixels."""

    def test_truncated_roi_file_raises(self, tmp_path):
        from ifcb_classifier_tpu.data.ifcb import Bin
        base = write_bin(str(tmp_path), "D20250101T000000_IFCB900",
                         [make_roi(10, 10, 1)], 2)
        with open(base + ".roi", "r+b") as f:
            f.truncate(30)  # 100 bytes promised by the ADC
        with pytest.raises(ValueError, match="outside the .roi file"):
            Bin(base + ".adc").images

    def test_negative_startbyte_raises_not_wraps(self, tmp_path):
        from ifcb_classifier_tpu.data.ifcb import ADC_COLUMNS_V2, Bin
        base = write_bin(str(tmp_path), "D20250102T000000_IFCB900",
                         [make_roi(10, 10, 2)], 2)
        # rewrite the ADC with startByte=-60: the wrapped slice
        # roi_bytes[-60:40] would be empty here, but for a longer file it
        # can be exactly h*w long and silently wrong — must raise either way
        cols = {c: i for i, c in enumerate(ADC_COLUMNS_V2)}
        row = ["0"] * len(ADC_COLUMNS_V2)
        row[cols["trigger"]] = "1"
        row[cols["roiWidth"]] = "10"
        row[cols["roiHeight"]] = "10"
        row[cols["startByte"]] = "-60"
        open(base + ".adc", "w").write(",".join(row) + "\n")
        with pytest.raises(ValueError, match="outside the .roi file"):
            Bin(base + ".adc").images
