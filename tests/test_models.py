"""Model zoo structural parity tests.

Exact parameter-count equality against published torchvision counts is a
strong structural check (layer sizes, head surgery, aux presence) that needs
no weights and no network. Shapes via jax.eval_shape (no FLOPs burned).
"""

import jax
import jax.numpy as jnp
import pytest

from ifcb_classifier_tpu.models import get_namebrand_model, input_size_for

# torchvision parameter counts @ 1000 classes
TORCHVISION_PARAM_COUNTS = {
    "resnet18": 11_689_512,
    "resnet34": 21_797_672,
    "resnet50": 25_557_032,
    "alexnet": 61_100_840,
    "vgg16": 138_357_544,
    "squeezenet": 1_235_496,       # squeezenet1_1
    "densenet121": 7_978_856,
    "inception_v3": 27_161_264,    # incl. AuxLogits
    "efficientnet_b0": 5_288_548,
    "efficientnet_b4": 19_341_616,
}


def shape_init(model, size, train):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    return jax.eval_shape(lambda: model.init(rngs, dummy, train=train))


def count_params(variables):
    leaves = jax.tree_util.tree_leaves(variables["params"])
    return sum(int(jnp.prod(jnp.asarray(l.shape))) for l in leaves)


class TestParamCounts:
    @pytest.mark.parametrize("name,expected",
                             sorted(TORCHVISION_PARAM_COUNTS.items()))
    def test_matches_torchvision(self, name, expected):
        model = get_namebrand_model(name, 1000)
        v = shape_init(model, input_size_for(name), train=True)
        assert count_params(v) == expected

    def test_head_surgery_changes_head_only(self):
        m1000 = get_namebrand_model("resnet18", 1000)
        m3 = get_namebrand_model("resnet18", 3)
        d = count_params(shape_init(m1000, 224, True)) - \
            count_params(shape_init(m3, 224, True))
        assert d == (512 + 1) * (1000 - 3)  # fc weights+bias delta

    def test_unknown_model_raises(self):
        with pytest.raises(KeyError):
            get_namebrand_model("nonexistent_net", 3)


class TestForward:
    def test_resnet18_forward_and_logits(self):
        model = get_namebrand_model("resnet18", 5)
        x = jnp.ones((2, 64, 64, 3), jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        out = model.apply(v, x, train=False)
        assert out.shape == (2, 5)
        assert out.dtype == jnp.float32

    def test_resnet18_batchstats_update(self):
        model = get_namebrand_model("resnet18", 5)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        out, mut = model.apply(v, x, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 5)
        flat = jax.tree_util.tree_leaves(mut["batch_stats"])
        assert any(bool((a != b).any()) for a, b in
                   zip(flat, jax.tree_util.tree_leaves(v["batch_stats"])))

    def test_inception_tuple_in_train_single_in_eval(self):
        model = get_namebrand_model("inception_v3", 7)
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        dummy = jnp.zeros((1, 299, 299, 3))
        shapes = jax.eval_shape(
            lambda: model.init(rngs, dummy, train=True))
        assert "AuxLogits" in shapes["params"]
        out_shapes = jax.eval_shape(
            lambda v: model.apply(v, dummy, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(2)},
                                  mutable=["batch_stats"]), shapes)
        (main, aux), _ = out_shapes
        assert main.shape == (1, 7) and aux.shape == (1, 7)
        eval_out, _ = jax.eval_shape(
            lambda v: model.apply(v, dummy, train=False,
                                  mutable=["batch_stats"]), shapes)
        assert eval_out.shape == (1, 7)

    @pytest.mark.parametrize("name", ["alexnet", "vgg16", "squeezenet",
                                      "densenet121", "efficientnet_b0"])
    def test_output_shapes(self, name):
        model = get_namebrand_model(name, 11)
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        dummy = jnp.zeros((2, input_size_for(name), input_size_for(name), 3))
        v = jax.eval_shape(lambda: model.init(rngs, dummy, train=True))
        out = jax.eval_shape(
            lambda vv: model.apply(vv, dummy, train=False,
                                   mutable=["batch_stats"]), v)
        logits = out[0] if isinstance(out, tuple) else out
        assert logits.shape == (2, 11)


class TestBatchNormVarianceClamp:
    def test_near_constant_large_mean_channel_stays_finite(self):
        """bf16 path uses one-pass E[x²]−E[x]²; f32 cancellation on a
        large-mean near-constant channel can make it slightly negative, and
        rsqrt(var+eps) would NaN the whole step without the clamp."""
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.models.layers import TorchBN

        x = jnp.full((64, 7, 7, 4), 37.161, jnp.bfloat16) + \
            jax.random.normal(jax.random.PRNGKey(0), (64, 7, 7, 4),
                              jnp.bfloat16) * 1e-4
        bn = TorchBN(dtype=jnp.bfloat16)
        v = bn.init(jax.random.PRNGKey(1), x, use_running_average=False)
        y, mut = bn.apply(v, x, use_running_average=False,
                          mutable=["batch_stats"])
        assert bool(jnp.isfinite(y.astype(jnp.float32)).all())
        assert float(mut["batch_stats"]["var"].min()) >= 0.0


class TestInceptionSizeGuard:
    def test_small_input_raises_clearly(self):
        """Sub-299 training inputs would silently NaN through the aux tower
        (zero-element reductions); must raise instead."""
        model = get_namebrand_model("inception_v3", 3)
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        with pytest.raises(ValueError, match="299x299"):
            jax.eval_shape(lambda: model.init(
                rngs, jnp.zeros((1, 128, 128, 3)), train=True))

    def test_eval_small_input_ok(self):
        """Eval (no aux) tolerates smaller inputs, like torchvision."""
        model = get_namebrand_model("inception_v3", 3)
        rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        v = jax.eval_shape(lambda: model.init(
            rngs, jnp.zeros((1, 299, 299, 3)), train=True))
        out = jax.eval_shape(
            lambda vv: model.apply(vv, jnp.zeros((1, 139, 139, 3)),
                                   train=False, mutable=["batch_stats"]), v)
        assert out[0].shape == (1, 3)
