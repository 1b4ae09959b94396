"""Native ROI packer tests: C++ path vs numpy fallback equivalence, bounds
safety, and the InferenceEngine bin fast path alignment."""

import numpy as np
import pytest

from ifcb_classifier_tpu import native
from fixtures import make_roi, write_bin


def _make_buffer(rois):
    starts, blob = [], bytearray()
    for r in rois:
        starts.append(len(blob))
        blob.extend(r.tobytes())
    return (np.frombuffer(bytes(blob), np.uint8),
            np.asarray(starts, np.int64),
            np.asarray([r.shape[0] for r in rois], np.int64),
            np.asarray([r.shape[1] for r in rois], np.int64))


class TestRoipack:
    def test_native_builds(self):
        assert native.available(), getattr(native, "_build_error", None)

    def test_pack_correct(self):
        rois = [make_roi(10, 20, 1), make_roi(5, 7, 2), make_roi(32, 32, 3)]
        buf, starts, hs, ws = _make_buffer(rois)
        canvas, sizes = native.pack_rois_native(buf, starts, hs, ws,
                                                batch_size=4, canvas_size=32)
        assert canvas.shape == (4, 32, 32)
        for i, r in enumerate(rois):
            h, w = r.shape
            np.testing.assert_array_equal(canvas[i, :h, :w], r)
            assert (canvas[i, h:, :] == 0).all() and (canvas[i, :, w:] == 0).all()
            assert tuple(sizes[i]) == (h, w)
        assert tuple(sizes[3]) == (1, 1)  # pad row

    def test_native_matches_fallback(self):
        rois = [make_roi(h, w, h * w) for h, w in
                [(3, 5), (64, 64), (17, 129), (1, 1)]]
        buf, starts, hs, ws = _make_buffer(rois)
        c1, s1 = native.pack_rois_native(buf, starts, hs, ws, 8, 128)
        # force fallback
        lib, native._lib = native._lib, None
        err, native._build_error = native._build_error, RuntimeError("forced")
        try:
            c2, s2 = native.pack_rois_native(buf, starts, hs, ws, 8, 128)
        finally:
            native._lib, native._build_error = lib, err
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(s1, s2)

    def test_out_of_bounds_roi_skipped(self):
        rois = [make_roi(4, 4, 0)]
        buf, starts, hs, ws = _make_buffer(rois)
        starts = np.asarray([9999], np.int64)  # past end of buffer
        canvas, sizes = native.pack_rois_native(buf, starts, hs, ws, 2, 32)
        assert tuple(sizes[0]) == (0, 0)
        assert (canvas[0] == 0).all()

    def test_int64_overflow_dims_skipped_not_oob(self):
        """Corrupt ADC dims near 2^32: h*w wraps int64, which would bypass
        a naive `s0 + h*w > roi_len` bounds check and memcpy out of bounds
        (segfault). The overflow-safe check must flag the row (0,0) — same
        as the numpy fallback."""
        rois = [make_roi(4, 4, 0)]
        buf, starts, hs, ws = _make_buffer(rois)
        big = np.asarray([1 << 32], np.int64)  # h*w == 2^64 -> wraps to 0
        canvas, sizes = native.pack_rois_native(buf, starts, big, big, 2, 32)
        assert tuple(sizes[0]) == (0, 0)
        assert (canvas[0] == 0).all()

    def test_oversize_roi_clamped(self):
        rois = [make_roi(40, 50, 4)]
        buf, starts, hs, ws = _make_buffer(rois)
        canvas, sizes = native.pack_rois_native(buf, starts, hs, ws, 1, 32)
        assert tuple(sizes[0]) == (32, 32)
        np.testing.assert_array_equal(canvas[0], rois[0][:32, :32])


class TestPredictBinAlignment:
    def test_targets_ordered_and_aligned(self, tmp_path):
        """Bin with mixed ROI sizes spanning two ladder buckets + an empty
        row: predict_bin must return ascending targets aligned with probs."""
        import jax
        jax.config.update("jax_platforms", "cpu")
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        from ifcb_classifier_tpu.train.state import create_train_state
        import jax.numpy as jnp

        model = get_namebrand_model("squeezenet", 3, dtype=jnp.float32)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), 224)
        ckpt = str(tmp_path / "m.ptl")
        save_checkpoint(ckpt, state.params, state.batch_stats,
                        dict(MODEL="squeezenet", classes=["a", "b", "c"],
                             resize=224, model_id="m", seed=1, img_norm=None))

        rois = [make_roi(20, 30, 1), None, make_roi(200, 40, 2),
                make_roi(8, 8, 3)]
        base = write_bin(str(tmp_path), "D20240301T000000_IFCB900", rois, 2)
        from ifcb_classifier_tpu.data.ifcb import Bin
        engine = InferenceEngine(ckpt, batch_size=4, dtype=jnp.float32)
        targets, probs = engine.predict_bin(Bin(base + ".adc"))
        assert targets == [1, 3, 4]
        assert probs.shape == (3, 3)
        np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-4)

        # alignment: target 3 (the 200x40 ROI, different bucket) must equal a
        # direct single-image prediction
        direct = engine.predict_images([rois[2]])
        np.testing.assert_allclose(probs[1], direct[0], atol=1e-4)


class TestBinErrorIsolation:
    def test_corrupt_bin_isolated_in_run(self, tmp_path, capsys):
        """A bin with a truncated .roi must be reported as failed while
        sibling bins still produce outputs (neuston_net.py:266-278 parity)."""
        import argparse, jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from ifcb_classifier_tpu.infer.runner import do_run
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        from ifcb_classifier_tpu.train.state import create_train_state

        model = get_namebrand_model("squeezenet", 2, dtype=jnp.float32)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), 224)
        ckpt = str(tmp_path / "m.ptl")
        save_checkpoint(ckpt, state.params, state.batch_stats,
                        dict(MODEL="squeezenet", classes=["a", "b"],
                             resize=224, model_id="m", seed=1, img_norm=None))

        bins = tmp_path / "bins"
        write_bin(str(bins), "D20240101T000000_IFCB900",
                  [make_roi(20, 20, 1)], 2)
        bad = write_bin(str(bins), "D20240102T000000_IFCB900",
                        [make_roi(30, 30, 2)], 2)
        with open(bad + ".adc", "w") as f:  # adc says 64k bytes; roi has 900
            f.write(",".join(["1"] + ["0"] * 14 + ["256", "256", "0"]
                             + ["0"] * 6) + "\n")

        args = argparse.Namespace(
            cmd_mode="RUN", SRC=str(bins), MODEL=ckpt, RUN_ID="r",
            batch_size=4, loaders=1, src_type="bin",
            outdir=str(tmp_path / "out"), outfile=["{BIN_ID}.json"],
            filter=None, clobber=False, gobig=False,
            cmd_timestamp="2026-08-16T00:00:00+00:00")
        do_run(args)
        out = capsys.readouterr().out
        assert (tmp_path / "out" / "D20240101T000000_IFCB900.json").exists()
        assert not (tmp_path / "out" / "D20240102T000000_IFCB900.json").exists()
        assert "Bins that errored" in out
        assert "D20240102T000000_IFCB900" in out


def test_pack_rois_native_rejects_overfull_batch():
    """n > batch_size would be out-of-bounds writes in the C path — the
    wrapper must fail loudly (review finding)."""
    import numpy as np
    import pytest
    from ifcb_classifier_tpu import native
    buf = np.zeros(1000, np.uint8)
    with pytest.raises(AssertionError, match="exceed batch_size"):
        native.pack_rois_native(buf, np.zeros(5, np.int64),
                                np.full(5, 4, np.int64),
                                np.full(5, 4, np.int64),
                                batch_size=4, canvas_size=64)


class TestImgDecode:
    """Native PNG/JPEG decoder (imgdecode.cpp) parity with PIL: supported
    variants decode byte-identically to PIL convert('RGB'/'L'); declined
    variants return None so decode_image falls back to PIL."""

    def _roundtrip(self, pil_img, fmt, rgb):
        import io
        from PIL import Image
        b = io.BytesIO()
        pil_img.save(b, fmt)
        data = b.getvalue()
        got = native.decode_bytes_native(data, rgb=rgb)
        want = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB" if rgb else "L"))
        return got, want

    def test_native_decoder_builds(self):
        assert native.decode_available(), getattr(native, "_img_error", None)

    @pytest.mark.parametrize("rgb", [True, False])
    def test_parity_matrix(self, rgb):
        from PIL import Image
        rng = np.random.RandomState(3)
        gray = rng.randint(0, 255, (41, 67), np.uint8)
        col = rng.randint(0, 255, (41, 67, 3), np.uint8)
        rgba = np.dstack([col, rng.randint(0, 255, (41, 67), np.uint8)])
        cases = [
            ("png-gray", Image.fromarray(gray), "PNG"),
            ("png-rgb", Image.fromarray(col), "PNG"),
            ("png-rgba", Image.fromarray(rgba, "RGBA"), "PNG"),
            ("png-palette", Image.fromarray(col).quantize(64), "PNG"),
            ("png-la", Image.merge("LA", [Image.fromarray(gray)] * 2), "PNG"),
            ("jpeg-gray", Image.fromarray(gray), "JPEG"),
            ("jpeg-rgb", Image.fromarray(col), "JPEG"),
        ]
        for tag, im, fmt in cases:
            got, want = self._roundtrip(im, fmt, rgb)
            assert got is not None, f"{tag}: declined"
            np.testing.assert_array_equal(got, want, err_msg=tag)

    @pytest.mark.parametrize("rgb", [True, False])
    def test_interlaced_png(self, rgb):
        import io
        from PIL import Image
        col = np.random.RandomState(4).randint(0, 255, (33, 57, 3), np.uint8)
        b = io.BytesIO()
        Image.fromarray(col).save(b, "PNG", interlace=True)
        got = native.decode_bytes_native(b.getvalue(), rgb=rgb)
        want = np.asarray(Image.open(io.BytesIO(b.getvalue()))
                          .convert("RGB" if rgb else "L"))
        np.testing.assert_array_equal(got, want)

    def test_declines_are_none_not_garbage(self):
        import io
        from PIL import Image
        # 16-bit PNG: PIL and libpng disagree on the narrowing; must decline
        g16 = (np.random.RandomState(5).randint(0, 255, (10, 12))
               .astype(np.uint16) * 257)
        b = io.BytesIO()
        Image.fromarray(g16).save(b, "PNG")
        assert native.decode_bytes_native(b.getvalue(), True) is None
        assert native.decode_bytes_native(b"not an image", True) is None
        assert native.decode_bytes_native(b.getvalue()[:40], True) is None

    def test_forged_giant_header_declined_not_memoryerror(self):
        """A corrupt/forged IHDR claiming e.g. 30000x30000 must be
        DECLINED (None -> PIL's own guards take over) — np.empty on the
        probe dims used to raise MemoryError out of HostLoader and kill
        a training run, bypassing PIL's decompression-bomb guard."""
        import io
        import struct
        import zlib
        from PIL import Image
        b = io.BytesIO()
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(b, "PNG")
        data = bytearray(b.getvalue())
        # patch IHDR width/height (bytes 16-23, big-endian) + re-CRC
        struct.pack_into(">II", data, 16, 30000, 30000)
        crc = zlib.crc32(bytes(data[12:29]))  # chunk type + 13-byte body
        struct.pack_into(">I", data, 29, crc & 0xFFFFFFFF)
        assert native.decode_bytes_native(bytes(data), True) is None

    def test_max_dim_declines_header_only(self):
        """max_dim: oversized-but-legit images are declined from the PROBE
        (no allocation, no discarded full decode) so decode_image's PIL
        thumbnail path pays exactly one decode."""
        import io
        from PIL import Image
        wide = np.zeros((4, 1100, 3), np.uint8)
        b = io.BytesIO()
        Image.fromarray(wide).save(b, "PNG")
        data = b.getvalue()
        assert native.decode_bytes_native(data, True, max_dim=1024) is None
        got = native.decode_bytes_native(data, True)  # no cap: decodes
        assert got is not None and got.shape == (4, 1100, 3)

    def test_decode_image_thumbnails_oversized_via_pil(self, tmp_path):
        from PIL import Image
        from ifcb_classifier_tpu.data.pipeline import MAX_CANVAS, decode_image
        wide = np.random.RandomState(8).randint(
            0, 255, (6, MAX_CANVAS + 100, 3), np.uint8)
        p = str(tmp_path / "wide.png")
        Image.fromarray(wide).save(p)
        img = decode_image(p)
        assert max(img.shape[:2]) <= MAX_CANVAS

    def test_march_env_gets_its_own_cache_slot(self, tmp_path):
        """IFCBNN_NATIVE_MARCH must participate in the .so cache key — a
        cached portable build used to silently ignore the flag (benchmarks
        under a false configuration)."""
        import shutil
        src = tmp_path / "roipack.cpp"
        shutil.copy(native._SRC, src)
        so = str(tmp_path / "libroipack.so")
        import os as _os
        old = _os.environ.get("IFCBNN_NATIVE_MARCH")
        try:
            _os.environ["IFCBNN_NATIVE_MARCH"] = "x86-64"
            native._build_and_load(so, str(src))
            assert _os.path.isfile(str(tmp_path / "libroipack-x86-64.so"))
            assert not _os.path.isfile(so)  # tagged slot, not the plain one
        finally:
            if old is None:
                _os.environ.pop("IFCBNN_NATIVE_MARCH", None)
            else:
                _os.environ["IFCBNN_NATIVE_MARCH"] = old

    def test_decode_image_uses_native_and_matches_pil(self, tmp_path):
        from PIL import Image
        from ifcb_classifier_tpu.data.pipeline import decode_image
        col = np.random.RandomState(6).randint(0, 255, (30, 40, 3), np.uint8)
        p = str(tmp_path / "x.png")
        Image.fromarray(col).save(p)
        for rgb in (True, False):
            got = decode_image(p, rgb=rgb)
            want = np.asarray(Image.open(p).convert("RGB" if rgb else "L"))
            np.testing.assert_array_equal(got, want)

    def test_decode_image_oversized_falls_back_to_pil_thumbnail(self,
                                                                tmp_path):
        from PIL import Image
        from ifcb_classifier_tpu.data.pipeline import MAX_CANVAS, decode_image
        big = np.zeros((MAX_CANVAS + 100, 64), np.uint8)
        p = str(tmp_path / "big.png")
        Image.fromarray(big).save(p)
        out = decode_image(p, rgb=True)
        assert max(out.shape[:2]) <= MAX_CANVAS  # PIL thumbnail applied

    def test_decode_image_16bit_falls_back_to_pil(self, tmp_path):
        from PIL import Image
        from ifcb_classifier_tpu.data.pipeline import decode_image
        g16 = (np.random.RandomState(7).randint(0, 255, (12, 14))
               .astype(np.uint16) * 257)
        p = str(tmp_path / "deep.png")
        Image.fromarray(g16).save(p)
        out = decode_image(p, rgb=True)  # native declines -> PIL path
        want = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(out, want)
