"""Batch-bucket ladder (infer/runner.py): small bins dispatch on the
smallest compiled bucket instead of always padding to the full batch.

The reference pays a full Trainer batch per bin regardless of bin size
(/root/reference/neuston_net.py:266); our per-bin path previously padded
every dispatch to `batch_size`. These tests pin (a) the bucket math,
(b) score parity bucketed-vs-full-batch on every engine route (predict_bin,
predict_images, gobig flush), and (c) data-mesh alignment on 8 devices.
"""

import numpy as np
import pytest

import jax

from fixtures import make_roi, write_bin


def test_bucket_math():
    from ifcb_classifier_tpu.infer.runner import _batch_buckets
    assert _batch_buckets(256) == (16, 32, 64, 128, 256)
    assert _batch_buckets(108) == (27, 54, 108)  # halving stops below 16
    assert _batch_buckets(16) == (16,)
    assert _batch_buckets(8) == (8,)
    assert _batch_buckets(256, enabled=False) == (256,)
    # every bucket aligned to the data-mesh axis
    assert all(b % 8 == 0 for b in _batch_buckets(256, align=8))
    # (the engine aligns batch_size itself before building the ladder)
    assert _batch_buckets(100, align=8) == (16, 32, 56, 100)


def test_bucket_for_selection():
    from ifcb_classifier_tpu.infer.runner import _batch_buckets

    class _E:
        batch_buckets = _batch_buckets(256)
        batch_size = 256
    from ifcb_classifier_tpu.infer.runner import InferenceEngine
    bucket_for = InferenceEngine.bucket_for
    assert bucket_for(_E, 1) == 16
    assert bucket_for(_E, 16) == 16
    assert bucket_for(_E, 17) == 32
    assert bucket_for(_E, 200) == 256
    assert bucket_for(_E, 256) == 256


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
    model = get_namebrand_model("squeezenet", 3, pretrained=False)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((1, 32, 32, 3), np.float32), train=False)
    p = str(tmp_path_factory.mktemp("bkt") / "m.ptl")
    save_checkpoint(p, jax.device_get(variables["params"]),
                    jax.device_get(variables.get("batch_stats", {})),
                    dict(MODEL="squeezenet", classes=["a", "b", "c"],
                         resize=32, model_id="m", seed=1, img_norm=None))
    return p


def _engines(ckpt):
    import jax.numpy as jnp
    from ifcb_classifier_tpu.infer.runner import InferenceEngine
    bucketed = InferenceEngine(ckpt, batch_size=64, dtype=jnp.float32)
    full = InferenceEngine(ckpt, batch_size=64, dtype=jnp.float32,
                           batch_ladder=False)
    assert bucketed.batch_buckets == (16, 32, 64)
    assert full.batch_buckets == (64,)
    return bucketed, full


def test_predict_bin_parity(ckpt, tmp_path):
    from ifcb_classifier_tpu.data.ifcb import Bin
    rois = [make_roi(10 + i, 14 + i, seed=i) for i in range(5)]
    base = write_bin(str(tmp_path), "D20250102T030405_IFCB900", rois, 2)
    bucketed, full = _engines(ckpt)
    t1, p1 = bucketed.predict_bin(Bin(base + ".adc"))
    t2, p2 = full.predict_bin(Bin(base + ".adc"))
    assert t1 == t2
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_predict_images_parity(ckpt):
    imgs = [make_roi(12, 20, seed=i) for i in range(3)]
    bucketed, full = _engines(ckpt)
    np.testing.assert_allclose(bucketed.predict_images(imgs),
                               full.predict_images(imgs), atol=1e-5)


def test_predict_images_ladder_major(ckpt):
    """predict_images groups by canvas ladder BEFORE chunking (VERDICT r3
    weak #3): one big image in a list of small ROIs must not inflate the
    small ROIs' canvases to its ladder. Asserts the dispatched canvas
    shapes per ladder AND that scores land in input order."""
    small = [make_roi(12, 20, seed=i) for i in range(5)]
    big = np.zeros((300, 400), np.uint8)
    big[:150, :200] = make_roi(150, 200, seed=99)
    imgs = small[:2] + [big] + small[2:]  # big in the middle

    bucketed, full = _engines(ckpt)
    dispatched = []
    orig = bucketed._dispatch

    def spy(canvas, sizes):
        dispatched.append(canvas.shape)
        return orig(canvas, sizes)

    bucketed._dispatch = spy
    probs = bucketed.predict_images(imgs)
    # two dispatches: the 5 small ROIs on the 64-ladder, the big one on 512
    assert sorted(s[1] for s in dispatched) == [64, 512], dispatched
    # scores identical (and in input order) vs per-image evaluation
    for k, img in enumerate(imgs):
        np.testing.assert_allclose(probs[k], full.predict_images([img])[0],
                                   atol=1e-5)


def test_predict_images_mixed_gray_rgb(ckpt):
    """A list mixing 2-D gray ROIs and 3-D RGB images packs as RGB for the
    WHOLE list (rgb=any(...)): gray rows broadcast to 3 channels, and a
    gray-first ordering must not pick a 2-D canvas that a later RGB image
    cannot fit (the pre-ladder-major code keyed rgb off chunk[0] only)."""
    gray = make_roi(12, 20, seed=1)
    rgb = np.stack([make_roi(14, 18, seed=2)] * 3, axis=-1)
    bucketed, full = _engines(ckpt)
    probs = bucketed.predict_images([gray, rgb, gray])  # gray first
    assert probs.shape[0] == 3
    # per-image scores match solo evaluation (gray==its own RGB broadcast)
    np.testing.assert_allclose(probs[0], probs[2], atol=1e-6)
    np.testing.assert_allclose(
        probs[1], full.predict_images([rgb])[0], atol=1e-5)
    np.testing.assert_allclose(
        probs[0], full.predict_images([gray])[0], atol=1e-5)


def test_gobig_flush_parity(ckpt, tmp_path):
    from ifcb_classifier_tpu.data.ifcb import Bin
    rois = [make_roi(9 + i, 11 + i, seed=100 + i) for i in range(7)]
    base = write_bin(str(tmp_path), "D20250102T030406_IFCB900", rois, 2)
    bucketed, full = _engines(ckpt)
    got = {}
    agg = bucketed.gobig(lambda b, t, p: got.update({"t": t, "p": p}),
                         lambda b, e: (_ for _ in ()).throw(e))
    b = Bin(base + ".adc")
    agg.add_bin(b, b)
    agg.flush()
    t_ref, p_ref = full.predict_bin(Bin(base + ".adc"))
    assert got["t"] == t_ref
    np.testing.assert_allclose(got["p"], p_ref, atol=1e-5)


def test_multidevice_bucket_alignment(ckpt):
    """8 virtual devices: every bucket must divide over the data axis."""
    import jax.numpy as jnp
    from ifcb_classifier_tpu.infer.runner import InferenceEngine
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    eng = InferenceEngine(ckpt, batch_size=64, dtype=jnp.float32)
    assert all(b % eng._mesh_shape[0] == 0 for b in eng.batch_buckets)
    imgs = [make_roi(15, 10, seed=i) for i in range(3)]  # < smallest bucket
    probs = eng.predict_images(imgs)
    assert probs.shape == (3, 3)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)


def test_predict_loader_parity(ckpt, tmp_path):
    """img-mode path: the final short HostLoader batch is sliced down to the
    smallest bucket (pads are tail rows) — scores must match full-batch."""
    from PIL import Image
    from ifcb_classifier_tpu.data.pipeline import HostLoader
    paths = []
    for i in range(5):
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(make_roi(13, 17, seed=200 + i)).save(p)
        paths.append(p)
    bucketed, full = _engines(ckpt)
    p1, f1 = bucketed.predict_loader(
        HostLoader(paths, batch_size=bucketed.batch_size, num_workers=1))
    p2, f2 = full.predict_loader(
        HostLoader(paths, batch_size=full.batch_size, num_workers=1))
    assert f1 == f2 == paths
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_int8_ladder_interaction(tmp_path):
    """int8 engine × ladder: calibration may run on a SMALL bucket (a tiny
    first bin), and the quantized program must then serve every other
    bucket shape. Scores stay close to the full-precision engine."""
    import jax.numpy as jnp
    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
    from ifcb_classifier_tpu.infer.runner import InferenceEngine
    model = get_namebrand_model("resnet18", 2, pretrained=False)
    variables = model.init({"params": jax.random.PRNGKey(3)},
                           np.zeros((1, 32, 32, 3), np.float32), train=False)
    p = str(tmp_path / "m.ptl")
    save_checkpoint(p, jax.device_get(variables["params"]),
                    jax.device_get(variables.get("batch_stats", {})),
                    dict(MODEL="resnet18", classes=["a", "b"], resize=32,
                         model_id="m", seed=1, img_norm=None))
    eng = InferenceEngine(p, batch_size=64, quant=True)
    assert eng.batch_buckets == (16, 32, 64)
    small = [make_roi(14, 18, seed=i) for i in range(3)]    # bucket 16
    big = [make_roi(14, 18, seed=50 + i) for i in range(40)]  # bucket 64
    eng.predict_images(small)                # calibrates on the 16-bucket
    assert eng._quant_ready
    p_q = eng.predict_images(big)
    ref = InferenceEngine(p, batch_size=64, dtype=jnp.float32, fold=False)
    p_ref = ref.predict_images(big)
    assert p_q.shape == p_ref.shape == (40, 2)
    np.testing.assert_allclose(p_q.sum(axis=1), 1.0, atol=1e-4)
    assert np.abs(p_q - p_ref).max() < 5e-2


def test_env_escape_hatch(ckpt, monkeypatch):
    import jax.numpy as jnp
    from ifcb_classifier_tpu.infer.runner import InferenceEngine
    monkeypatch.setenv("IFCBNN_NO_BATCH_LADDER", "1")
    eng = InferenceEngine(ckpt, batch_size=64, dtype=jnp.float32)
    assert eng.batch_buckets == (64,)
