"""Eval-time BN→conv folding (models/fold.py): numerics vs the unfolded
model, engine integration, and the eval-only guard.

The folding itself has no reference counterpart (the reference's deployment
path leans on cuDNN/onnxruntime internal fusions, neuston_onnx.py:44-65);
what these tests pin is that OUR fold is score-neutral, so the inference
engine can enable it by default."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_roi, write_bin


def _randomized_variables(model, rng, size):
    """Init, then randomize BN params and running stats — the init values
    (scale=1, bias=0, mean=0, var=1) make folding a near-no-op and would
    hide transform bugs."""
    # train=False: eval structure only (inception's aux tower needs 299px
    # inputs in train mode and is absent from the eval graph anyway)
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": rng},
                           jnp.zeros((1, size, size, 3)), train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    r = np.random.default_rng(7)

    def walk(tree, kind):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, kind)
            elif kind == "params" and k == "scale":
                tree[k] = r.uniform(0.5, 1.5, v.shape).astype(np.float32)
            elif kind == "params" and k == "bias" and v.ndim == 1:
                tree[k] = r.normal(0, 0.2, v.shape).astype(np.float32)
            elif kind == "stats" and k == "mean":
                tree[k] = r.normal(0, 0.5, v.shape).astype(np.float32)
            elif kind == "stats" and k == "var":
                tree[k] = r.uniform(0.3, 3.0, v.shape).astype(np.float32)

    walk(params, "params")
    walk(stats, "stats")
    return params, stats


@pytest.mark.parametrize("name,size", [("resnet18", 64), ("resnet50", 64),
                                       ("inception_v3", 96),
                                       ("vgg11_bn", 224),  # 7x32 pool rule
                                       ("efficientnet_b0", 64)])
def test_folded_logits_match_unfolded(name, size):
    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.models.fold import fold_params

    model = get_namebrand_model(name, 5)
    params, stats = _randomized_variables(model, jax.random.PRNGKey(1), size)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, size, size, 3))

    ref = model.apply({"params": params, "batch_stats": stats}, x,
                      train=False)
    fparams, fstats = fold_params(name, params, stats)
    assert fstats == {}
    folded = get_namebrand_model(name, 5, fold_bn=True)
    got = folded.apply({"params": fparams, "batch_stats": {}}, x,
                       train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=0)
    # f32 fold should be far tighter than the advertised 1e-3 gate
    assert float(np.abs(np.asarray(got) - np.asarray(ref)).max()) < 1e-4


def test_folded_model_rejects_training():
    from ifcb_classifier_tpu.models import get_namebrand_model
    model = get_namebrand_model("resnet18", 3, fold_bn=True)
    x = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError, match="eval-only"):
        model.init({"params": jax.random.PRNGKey(0)}, x, train=True)


def test_fold_unsupported_family_raises():
    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.models.fold import supports_fold
    assert not supports_fold("densenet121")  # pre-activation: relu blocks it
    assert not supports_fold("vgg16")        # no BN to fold
    assert not supports_fold("alexnet")
    with pytest.raises(ValueError, match="fold_bn unsupported"):
        get_namebrand_model("densenet121", 3, fold_bn=True)


class TestEngineFolding:
    @pytest.fixture()
    def ckpt(self, tmp_path):
        """resnet18 checkpoint with RANDOMIZED BN stats (trained-like)."""
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        model = get_namebrand_model("resnet18", 2)
        params, stats = _randomized_variables(model, jax.random.PRNGKey(3),
                                              32)
        p = str(tmp_path / "m.ptl")
        save_checkpoint(p, params, stats,
                        dict(MODEL="resnet18", classes=["a", "b"], resize=32,
                             model_id="m", seed=1, img_norm=None))
        return p

    def test_engine_folds_by_default_and_scores_match(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.data.ifcb import Bin
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        base = write_bin(str(tmp_path), "D20250401T000000_IFCB900",
                         [make_roi(18, 22, 1), make_roi(12, 12, 2)], 2)
        eng = InferenceEngine(ckpt, batch_size=8)
        ref = InferenceEngine(ckpt, batch_size=8, fold=False)
        assert eng.folded and not ref.folded
        t1, p1 = eng.predict_bin(Bin(base + ".adc"))
        t2, p2 = ref.predict_bin(Bin(base + ".adc"))
        assert t1 == t2
        np.testing.assert_allclose(p1, p2, atol=1e-3)

    def test_no_fold_env_escape_hatch(self, ckpt, monkeypatch):
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        monkeypatch.setenv("IFCBNN_NO_FOLD", "1")
        eng = InferenceEngine(ckpt, batch_size=8)
        assert not eng.folded
