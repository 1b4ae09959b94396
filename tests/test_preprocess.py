"""Tests for device-side preprocessing (ops/preprocess.py): PIL-parity resize,
gray→RGB, normalization, flips, canvas padding isolation."""

import numpy as np
import pytest

from ifcb_classifier_tpu.data.pipeline import pack_canvas_batch, HostLoader, prefetch
from fixtures import make_roi, write_image_folder_dataset


def pil_resize(arr, size):
    from PIL import Image
    return np.asarray(Image.fromarray(arr).resize((size, size), Image.BILINEAR),
                      dtype=np.float32)


class TestResizeMatmul:
    @pytest.mark.parametrize("h,w", [(40, 60), (300, 200), (10, 10), (224, 224)])
    def test_matches_pil_bilinear(self, h, w):
        from ifcb_classifier_tpu.ops.preprocess import resize_bilinear_matmul
        img = make_roi(h, w, seed=h * w)
        rgb = np.stack([img] * 3, axis=-1)
        out = np.asarray(resize_bilinear_matmul(rgb.astype(np.float32), h, w, 64))
        ref = pil_resize(rgb, 64)
        # PIL uses uint8 fixed-point accumulation; allow ~1.5 LSB
        assert np.abs(out - ref).max() <= 2.0

    def test_canvas_padding_ignored(self):
        from ifcb_classifier_tpu.ops.preprocess import resize_bilinear_matmul
        img = make_roi(50, 30, seed=3).astype(np.float32)[..., None]
        canvas = np.zeros((128, 128, 1), np.float32)
        canvas[:50, :30] = img
        canvas2 = np.full((128, 128, 1), 255.0, np.float32)
        canvas2[:50, :30] = img
        out1 = np.asarray(resize_bilinear_matmul(canvas, 50, 30, 32))
        out2 = np.asarray(resize_bilinear_matmul(canvas2, 50, 30, 32))
        np.testing.assert_allclose(out1, out2, atol=1e-3)

    def test_identity_when_same_size(self):
        from ifcb_classifier_tpu.ops.preprocess import resize_bilinear_matmul
        img = make_roi(32, 32, seed=9).astype(np.float32)[..., None]
        out = np.asarray(resize_bilinear_matmul(img, 32, 32, 32))
        np.testing.assert_allclose(out[..., 0], img[..., 0], atol=1e-2)


class TestPreprocessBatch:
    def test_gray_to_rgb_and_range(self):
        from ifcb_classifier_tpu.ops.preprocess import preprocess_batch
        rois = [make_roi(20, 30, 1), make_roi(40, 25, 2)]
        canvas, sizes, n = pack_canvas_batch(rois, batch_size=4, rgb=False)
        out = np.asarray(preprocess_batch(canvas, sizes, out_size=32))
        assert out.shape == (4, 32, 32, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0
        np.testing.assert_array_equal(out[..., 0], out[..., 1])

    def test_normalize(self):
        from ifcb_classifier_tpu.ops.preprocess import preprocess_batch
        rois = [np.full((16, 16), 128, np.uint8)]
        canvas, sizes, _ = pack_canvas_batch(rois, rgb=False)
        out = np.asarray(preprocess_batch(
            canvas, sizes, out_size=8, mean=[0.5, 0.5, 0.5], std=[0.25, 0.5, 1.0]))
        expect = (128 / 255 - 0.5) / np.array([0.25, 0.5, 1.0])
        np.testing.assert_allclose(out[0, 4, 4], expect, atol=1e-3)

    def test_flip_deterministic_under_key(self):
        import jax
        from ifcb_classifier_tpu.ops.preprocess import preprocess_batch
        rois = [make_roi(16, 16, s) for s in range(8)]
        canvas, sizes, _ = pack_canvas_batch(rois, rgb=False)
        k = jax.random.PRNGKey(0)
        a = np.asarray(preprocess_batch(canvas, sizes, k, out_size=16, flip_x=True))
        b = np.asarray(preprocess_batch(canvas, sizes, k, out_size=16, flip_x=True))
        np.testing.assert_array_equal(a, b)
        base = np.asarray(preprocess_batch(canvas, sizes, out_size=16))
        flipped = np.abs(a - base).max(axis=(1, 2, 3)) > 0
        assert flipped.any()  # some images flipped
        for i in np.nonzero(flipped)[0]:
            np.testing.assert_allclose(a[i], base[i, ::-1], atol=1e-5)


class TestPackCanvasMixedChannels:
    def test_first_gray_still_infers_rgb_canvas(self):
        """rgb=None inference uses any(), not images[0]: a mixed list whose
        FIRST entry is grayscale must still get a 3-channel canvas (the
        old first-element inference crashed on the later RGB row)."""
        gray = np.full((8, 10), 7, np.uint8)
        rgbi = np.full((6, 7, 3), 9, np.uint8)
        canvas, sizes, n = pack_canvas_batch([gray, rgbi])
        assert canvas.shape == (2, 64, 64, 3) and n == 2
        assert (canvas[0, :8, :10] == 7).all()  # gray broadcast to 3ch
        assert (canvas[1, :6, :7] == 9).all()

    def test_explicit_gray_canvas_rejects_rgb_rows(self):
        with pytest.raises(AssertionError, match="rgb=False"):
            pack_canvas_batch([np.zeros((4, 4, 3), np.uint8)], rgb=False)


class TestHostLoader:
    def test_loader_batches_and_padding(self, tmp_path):
        src = write_image_folder_dataset(str(tmp_path / "d"), {"a": 5})
        import os
        paths = sorted(os.path.join(src, "a", f) for f in os.listdir(src + "/a"))
        loader = HostLoader(paths, labels=[0] * 5, batch_size=4, shuffle=False)
        batches = list(prefetch(iter(loader)))
        assert len(batches) == 2
        assert batches[0]["canvas"].shape[0] == 4
        assert batches[0]["mask"].all()
        assert batches[1]["mask"].sum() == 1

    def test_n_real_masks_manifest_pads(self):
        """items[n_real:] are multi-host manifest pads: decoded and packed
        (step-count equality, BN sees real pixels) but masked out of
        loss/metrics exactly like batch pads."""
        items = [make_roi(8, 8, s) for s in range(6)]
        loader = HostLoader(items, labels=list(range(6)), batch_size=3,
                            shuffle=False, rgb=False, n_real=4)
        batches = list(loader)
        assert batches[0]["mask"].tolist() == [True, True, True]
        assert batches[1]["mask"].tolist() == [True, False, False]
        # pads are real decoded images, not zeros
        assert batches[1]["canvas"][1].any()

    def test_loader_shuffle_per_epoch(self):
        items = [make_roi(8, 8, s) for s in range(10)]
        loader = HostLoader(items, labels=list(range(10)), batch_size=10,
                            shuffle=True, seed=1, rgb=False)
        e1 = next(iter(loader))["labels"].tolist()
        e2 = next(iter(loader))["labels"].tolist()
        assert sorted(e1) == list(range(10))
        assert e1 != e2  # reshuffled across epochs


class TestBalancedSampling:
    def test_balanced_epoch_composition(self):
        from ifcb_classifier_tpu.data.pipeline import HostLoader
        import numpy as np
        # 90:10 imbalance
        items = [make_roi(8, 8, s) for s in range(100)]
        labels = [0] * 90 + [1] * 10
        loader = HostLoader(items, labels, batch_size=100, shuffle=True,
                            seed=3, rgb=False, balanced=True)
        got = next(iter(loader))["labels"]
        frac1 = (got == 1).mean()
        assert 0.3 < frac1 < 0.7  # ~0.5 under balancing, 0.1 without

    def test_unbalanced_unchanged(self):
        from ifcb_classifier_tpu.data.pipeline import HostLoader
        items = [make_roi(8, 8, s) for s in range(20)]
        labels = [0] * 18 + [1] * 2
        loader = HostLoader(items, labels, batch_size=20, shuffle=True,
                            seed=3, rgb=False)
        got = sorted(next(iter(loader))["labels"].tolist())
        assert got == sorted(labels)  # permutation, no replacement


class TestResizeWeightProperties:
    """Properties PIL parity rests on: rows are a convex combination over
    in-bounds source pixels, for every (src, canvas, out) configuration."""

    @pytest.mark.parametrize("src,canvas,out", [
        (1, 64, 224), (3, 64, 32), (63, 64, 299), (64, 64, 8),
        (40, 128, 224), (128, 128, 128), (100, 1024, 17)])
    def test_rows_convex_and_bounded(self, src, canvas, out):
        from ifcb_classifier_tpu.ops.preprocess import resize_weights
        import numpy as np
        w = np.asarray(resize_weights(src, canvas, out))
        assert w.shape == (out, canvas)
        assert (w >= 0).all()
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
        if src < canvas:
            assert np.abs(w[:, src:]).max() == 0.0  # padding never leaks


class TestPrefetch:
    def test_error_propagates_to_consumer(self):
        def gen():
            yield 1
            raise RuntimeError("decode exploded")
        it = prefetch(gen())
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="decode exploded"):
            list(it)

    def test_order_preserved(self):
        assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))

    def test_abandoned_consumer_stops_producer(self):
        """If the consumer stops iterating early the producer thread must
        exit instead of blocking on a full queue forever (thread + decoded
        batch leak per abandoned iterator in a long-lived process)."""
        import time
        produced = []

        def gen():
            for i in range(10_000):
                produced.append(i)
                yield i

        it = prefetch(gen(), depth=2)
        assert next(it) == 0
        it.close()  # consumer abandons mid-stream (exception/break/GC)
        deadline = time.time() + 5.0
        last = -1
        while time.time() < deadline:
            cur = len(produced)
            if cur == last:  # two consecutive polls unchanged → stopped
                break
            last = cur
            time.sleep(0.25)
        assert len(produced) == last and last < 100, \
            f"producer still running ({len(produced)} items)"


def test_make_preprocessor_matches_preprocess_batch():
    """make_preprocessor is the public jit convenience (docs/API.md); pin it
    to the fused-path function so the two can't silently drift."""
    import jax
    import numpy as np
    from ifcb_classifier_tpu.ops.preprocess import (make_preprocessor,
                                                    preprocess_batch)
    rng = np.random.default_rng(5)
    canvas = rng.integers(0, 256, (4, 64, 64), np.uint8)
    sizes = np.asarray([[40, 64], [64, 30], [10, 10], [64, 64]], np.int32)
    pre = make_preprocessor(out_size=32, mean=(0.5, 0.4, 0.3),
                            std=(0.2, 0.2, 0.25))
    a = jax.device_get(pre(canvas, sizes))
    b = jax.device_get(preprocess_batch(canvas, sizes, out_size=32,
                                        mean=(0.5, 0.4, 0.3),
                                        std=(0.2, 0.2, 0.25)))
    # jit fusion may reassociate the resize matmuls — equal to fp32 noise
    np.testing.assert_allclose(a, b, atol=1e-5)
