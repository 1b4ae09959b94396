"""Quantify the bf16-vs-fp32 inference score delta (VERDICT round-1 #9).

The RUN engine defaults to bf16 compute on TPU while the reference infers in
fp32 (neuston_models.py:152-157). These tests measure the resulting softmax
score deltas — through the same float16 .h5 output quantization the result
files use — and pin the bound recorded in QUIRKS.md. `RUN --precision fp32`
is the reference-exact escape hatch (tested to honor the flag).
"""

import numpy as np
import pytest


def _probs(model, variables, x, dtype):
    import jax.numpy as jnp

    from ifcb_classifier_tpu.train.state import make_predict_step
    predict = make_predict_step(model)
    return np.asarray(predict(variables["params"],
                              variables.get("batch_stats", {}),
                              jnp.asarray(x, dtype)))


@pytest.mark.parametrize("family,size", [("resnet18", 96), ("squeezenet", 96)])
def test_bf16_score_delta_bound(family, size):
    """bf16 probs vs fp32 probs on the same weights/inputs: argmax stable
    on confident rows, absolute prob delta within the documented bound."""
    import jax
    import jax.numpy as jnp

    from ifcb_classifier_tpu.models import get_namebrand_model

    n_cls, B = 6, 32
    rng = np.random.RandomState(0)
    x = rng.rand(B, size, size, 3).astype(np.float32)

    m32 = get_namebrand_model(family, n_cls, dtype=jnp.float32)
    v = m32.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)},
                 jnp.zeros((1, size, size, 3)), train=False)
    m16 = get_namebrand_model(family, n_cls, dtype=jnp.bfloat16)

    p32 = _probs(m32, v, x, jnp.float32)
    p16 = _probs(m16, v, x, jnp.float32)  # params f32, compute bf16

    delta = np.abs(p16 - p32).max()
    # measured ~1e-2 worst-case on random weights (logit noise accumulates
    # through bf16 convs); the QUIRKS.md documented bound
    assert delta < 5e-2, f"bf16 prob delta {delta} exceeds documented bound"

    # argmax must be stable wherever fp32 is confident (margin > 2*delta)
    top32 = p32.argmax(1)
    sorted32 = np.sort(p32, axis=1)
    margin = sorted32[:, -1] - sorted32[:, -2]
    confident = margin > 2 * delta
    assert (p16.argmax(1)[confident] == top32[confident]).all()

    # through the f16 .h5 quantization both precisions' files agree within
    # the same bound (f16 grid step ~5e-4 around 0.5 — subdominant)
    q32 = p32.astype(np.float16)
    q16 = p16.astype(np.float16)
    assert np.abs(q16.astype(np.float32) - q32.astype(np.float32)).max() \
        < 5e-2 + 1e-3


def test_run_precision_flag_selects_dtype(tmp_path):
    """RUN --precision fp32 must reach the engine (reference-exact mode)."""
    import jax
    import jax.numpy as jnp

    from ifcb_classifier_tpu.infer import runner
    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
    from ifcb_classifier_tpu.train.state import create_train_state

    model = get_namebrand_model("squeezenet", 3, dtype=jnp.float32)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), 64)
    ckpt = str(tmp_path / "m.ptl")
    save_checkpoint(ckpt, state.params, state.batch_stats,
                    dict(MODEL="squeezenet", classes=["x", "y", "z"],
                         resize=64, model_id="m", seed=1, img_norm=None))

    seen = {}
    real_engine = runner.InferenceEngine

    class Spy(real_engine):
        def __init__(self, *a, **kw):
            seen.update(kw)
            raise RuntimeError("stop here")

    runner.InferenceEngine = Spy
    try:
        import argparse
        args = argparse.Namespace(MODEL=ckpt, batch_size=4,
                                  precision="fp32")
        with pytest.raises(RuntimeError, match="stop here"):
            runner.do_run(args)
    finally:
        runner.InferenceEngine = real_engine
    assert seen.get("dtype") == jnp.float32
