"""The Optimization group — the reference's reserved-but-commented-out
`--optimizer/--learning-rate/--weight-decay/--class-norm` surface
(neuston_net.py:385-390), implemented here. Optimizer update math is
verified directly against torch.optim; weighted CE against
torch.nn.CrossEntropyLoss(weight=...)."""

import os

import numpy as np
import pytest

from fixtures import write_image_folder_dataset


def _torch_steps(opt_name, lr, wd, w0, grads):
    """Run len(grads) steps of the torch optimizer on a single tensor whose
    .grad is set per step; returns the final weights."""
    import torch
    p = torch.nn.Parameter(torch.tensor(w0, dtype=torch.float64))
    if opt_name == "Adam":
        opt = torch.optim.Adam([p], lr=lr, betas=(0.9, 0.999), eps=1e-8,
                               weight_decay=wd)
    elif opt_name == "AdamW":
        opt = torch.optim.AdamW([p], lr=lr, betas=(0.9, 0.999), eps=1e-8,
                                weight_decay=wd)
    else:
        opt = torch.optim.SGD([p], lr=lr, momentum=0.9, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g, dtype=torch.float64)
        opt.step()
    return p.detach().numpy()


def _optax_steps(opt_name, lr, wd, w0, grads):
    import jax.numpy as jnp
    from ifcb_classifier_tpu.train.state import make_optimizer
    tx = make_optimizer(opt_name, lr, wd)
    w = jnp.asarray(w0, jnp.float64)
    st = tx.init(w)
    import optax
    for g in grads:
        upd, st = tx.update(jnp.asarray(g, jnp.float64), st, w)
        w = optax.apply_updates(w, upd)
    return np.asarray(w)


class TestOptimizerTorchParity:
    W0 = [0.5, -1.2, 3.0, 0.01]
    GRADS = [[0.1, -0.2, 0.05, 1.0],
             [-0.3, 0.4, 0.2, -0.5],
             [0.02, 0.02, -0.7, 0.3]]

    @pytest.mark.parametrize("opt,wd", [
        ("Adam", 0.0), ("Adam", 0.01),
        ("AdamW", 0.01), ("AdamW", 0.0),
        ("SGD", 0.0), ("SGD", 0.005),
    ])
    def test_updates_match_torch(self, opt, wd):
        import jax
        jax.config.update("jax_enable_x64", True)
        try:
            ours = _optax_steps(opt, 1e-3, wd, self.W0, self.GRADS)
        finally:
            jax.config.update("jax_enable_x64", False)
        ref = _torch_steps(opt, 1e-3, wd, self.W0, self.GRADS)
        np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)

    def test_unknown_optimizer_rejected(self):
        from ifcb_classifier_tpu.train.state import make_optimizer
        with pytest.raises(ValueError, match="unknown optimizer"):
            make_optimizer("RMSProp")

    def test_adam_no_decay_state_matches_legacy_layout(self):
        # resume-compat: wd=0 must produce optax.adam's exact state pytree
        import jax.numpy as jnp
        import optax
        from ifcb_classifier_tpu.train.state import make_optimizer
        w = jnp.ones((3,))
        legacy = optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8).init(w)
        ours = make_optimizer("Adam", 1e-3, 0.0).init(w)
        import jax
        assert (jax.tree_util.tree_structure(legacy) ==
                jax.tree_util.tree_structure(ours))


class TestWeightedCrossEntropy:
    def test_matches_torch_weighted_ce(self):
        import torch
        import jax.numpy as jnp
        from ifcb_classifier_tpu.train.state import cross_entropy
        rng = np.random.default_rng(3)
        logits = rng.normal(size=(10, 4)).astype(np.float32)
        labels = rng.integers(0, 4, 10)
        w = np.asarray([0.5, 2.0, 1.0, 3.5], np.float32)
        ref = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
            torch.tensor(logits), torch.tensor(labels)).item()
        ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                   jnp.ones(10, bool), class_weights=w))
        assert abs(ours - ref) < 1e-6

    def test_mask_excludes_pad_rows(self):
        import jax.numpy as jnp
        from ifcb_classifier_tpu.train.state import cross_entropy
        logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0], [9.0, -9.0]])
        labels = jnp.asarray([0, 1, 1])  # pad row would add a huge loss
        mask = jnp.asarray([True, True, False])
        full = float(cross_entropy(logits, labels, jnp.ones(3, bool),
                                   class_weights=jnp.asarray([1., 1.])))
        masked = float(cross_entropy(logits, labels, mask,
                                     class_weights=jnp.asarray([1., 1.])))
        assert masked < full


class TestOptimCLIAndLoop:
    def test_cli_parses_group(self):
        from ifcb_classifier_tpu.cli import argparse_nn
        a = argparse_nn().parse_args(
            ["TRAIN", "src", "resnet18", "id", "--optimizer", "SGD",
             "--learning-rate", "0.01", "--weight-decay", "1e-4",
             "--class-norm"])
        assert (a.optimizer, a.learning_rate, a.weight_decay,
                a.class_norm) == ("SGD", 0.01, 1e-4, True)
        d = argparse_nn().parse_args(["TRAIN", "src", "resnet18", "id"])
        assert (d.optimizer, d.learning_rate, d.weight_decay,
                d.class_norm) == ("Adam", 0.001, 0.0, False)

    def test_train_e2e_sgd_class_norm(self, tmp_path, capsys):
        from test_train_loop import make_args
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            # imbalanced classes so --class-norm has real weights to compute
            src = write_image_folder_dataset(
                str(tmp_path / "ds"), {"a": 12, "b": 4}, size=(36, 28))
            outdir = str(tmp_path / "out")
            args = make_args(src, outdir, emax=2, optimizer="SGD",
                             learning_rate=0.01, weight_decay=1e-4,
                             class_norm=True)
            from ifcb_classifier_tpu.train.loop import do_training
            ckpt = do_training(args)
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)
        assert os.path.isfile(ckpt)
        assert "Class-normalized loss" in capsys.readouterr().out

    def test_learning_rate_changes_updates(self, tmp_path):
        # two single-step trainings from the same init must diverge iff lr does
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.state import (create_train_state,
                                                     make_train_step)
        model = get_namebrand_model("squeezenet", 2, dtype=jnp.float32)
        batch = dict(images=jnp.ones((4, 32, 32, 3)) * 0.3,
                     labels=jnp.asarray([0, 1, 0, 1]),
                     mask=jnp.ones(4, bool))
        outs = []
        for lr in (1e-3, 1e-2, 1e-2):
            st, tx = create_train_state(model, jax.random.PRNGKey(0), 32,
                                        learning_rate=lr)
            step = jax.jit(make_train_step(model, tx))
            st2, _ = step(st, batch, jax.random.PRNGKey(1))
            outs.append(jax.device_get(
                jax.tree_util.tree_leaves(st2.params)[0]))
        assert not np.allclose(outs[0], outs[1])
        np.testing.assert_array_equal(outs[1], outs[2])
