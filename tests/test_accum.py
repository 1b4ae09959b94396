"""Gradient accumulation (`--accum`, no reference analog): one optimizer
step per batch, forward/backward over sequential micro-batches.

The contract (train/state.py make_train_step): the update equals the
masked-mean gradient of the FULL batch — micro gradients combine weighted
by each micro's valid-row count — and BatchNorm behaves exactly like a
torch accumulate-then-step loop (per-micro batch stats, sequential
running-stat updates). Micro k takes the INTERLEAVED rows [k::accum] so
each device keeps its own rows under a 'data' mesh (collective-free
split); the manual host loops below use the same row assignment."""

import argparse
import os

import numpy as np
import pytest

from fixtures import write_image_folder_dataset


def _setup(mask, optimizer="Adam"):
    import jax
    import jax.numpy as jnp

    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.state import create_train_state

    model = get_namebrand_model("resnet18", 4, dtype=jnp.float32)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), 32,
                                   optimizer=optimizer)
    rng = np.random.RandomState(0)
    batch = dict(images=jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32),
                 labels=jnp.asarray(rng.randint(0, 4, 8), jnp.int32),
                 mask=jnp.asarray(mask, bool))
    return model, state, tx, batch


class TestAccumStep:
    def test_matches_manual_sequential_weighted(self):
        """accum=2 == two sequential micro passes with stats threading,
        count-weighted gradient combine, ONE optimizer update. The two
        micros carry UNEQUAL valid-row counts (3 vs 2 after interleaving)
        so the weighting is exercised: a naive unweighted grad average
        would differ.

        SGD (update linear in the gradient) rather than Adam: the scan's
        float accumulation order differs from the host loop at ~1e-7 per
        gradient element, and Adam's step-1 update (~lr*sign(g)) turns
        that into full lr-sized quanta wherever a gradient sits at zero —
        the linear optimizer keeps the comparison at float tolerance."""
        import jax
        import jax.numpy as jnp
        import optax

        from ifcb_classifier_tpu.train.state import (loss_fn,
                                                     make_train_step)

        model, state, tx, batch = _setup([1, 1, 1, 1, 1, 0, 0, 0],
                                         optimizer="SGD")
        step = jax.jit(make_train_step(model, tx, accum=2))
        s2, loss = step(state, batch, jax.random.PRNGKey(7))

        def micro_loss(params, stats, mb, rng):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": stats},
                mb["images"], train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            loss = loss_fn(outputs, mb["labels"], mb["mask"])
            return loss, (mutated["batch_stats"],
                          jnp.sum(mb["mask"].astype(jnp.float32)))

        grad_fn = jax.jit(jax.value_and_grad(micro_loss, has_aux=True))
        rngs = jax.random.split(jax.random.PRNGKey(7), 2)
        stats = state.batch_stats
        gsum, lsum, dsum = None, 0.0, 0.0
        for i in range(2):
            mb = {k: v[i::2] for k, v in batch.items()}
            (li, (stats, di)), gi = grad_fn(state.params, stats, mb,
                                            rngs[i])
            di = float(di)
            gi = jax.tree_util.tree_map(lambda g: np.asarray(g) * di, gi)
            gsum = gi if gsum is None else jax.tree_util.tree_map(
                lambda a, b: a + b, gsum, gi)
            lsum += float(li) * di
            dsum += di
        grads = jax.tree_util.tree_map(lambda g: g / dsum, gsum)
        updates, _ = tx.update(
            jax.tree_util.tree_map(np.asarray, grads),
            state.opt_state, state.params)
        want_params = optax.apply_updates(state.params, updates)

        assert float(loss) == pytest.approx(lsum / dsum, rel=1e-5)
        for got, want in zip(jax.tree_util.tree_leaves(s2.params),
                             jax.tree_util.tree_leaves(want_params)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-6)
        # running stats: sequential micro-batch updates, exactly
        for got, want in zip(jax.tree_util.tree_leaves(s2.batch_stats),
                             jax.tree_util.tree_leaves(stats)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-6)

    def test_weighting_differs_from_naive_average(self):
        """With unequal valid counts the count-weighted combine must NOT
        equal the unweighted mean of micro losses — guards against a
        regression to naive averaging."""
        import jax

        from ifcb_classifier_tpu.train.state import (loss_fn,
                                                     make_train_step)

        model, state, tx, batch = _setup([1, 1, 1, 1, 1, 0, 0, 0])
        step = jax.jit(make_train_step(model, tx, accum=2))
        _, loss = step(state, batch, jax.random.PRNGKey(7))

        losses = []
        for i in range(2):
            mb = {k: v[i::2] for k, v in batch.items()}
            outputs, _ = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                mb["images"], train=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"])
            losses.append(float(loss_fn(outputs, mb["labels"], mb["mask"])))
        # interleaved micros: rows [0,2,4,6] -> 3 valid, [1,3,5,7] -> 2
        weighted = (losses[0] * 3 + losses[1] * 2) / 5
        naive = (losses[0] + losses[1]) / 2
        assert float(loss) == pytest.approx(weighted, rel=1e-5)
        assert abs(weighted - naive) > 1e-6  # the cases differ

    def test_accum_under_mesh(self):
        """accum=2 composes with the DP4xTP2 sharded step (micro-batches
        shard over 'data'); loss finite, params update. The interleaved
        micro split must compile COLLECTIVE-FREE for the input batch: a
        contiguous split all-gathered the full image array every step
        (micro rows spanned devices) — assert no all-gather touches the
        image shape in the compiled HLO."""
        import jax
        import jax.numpy as jnp

        from ifcb_classifier_tpu.parallel.mesh import (make_mesh,
                                                       replicated,
                                                       shard_batch,
                                                       state_shardings)
        from ifcb_classifier_tpu.train.state import make_train_step

        model, state, tx, batch = _setup([1] * 8)
        batch = {k: jnp.concatenate([v, v]) for k, v in batch.items()}
        mesh = make_mesh(n_data=4, n_model=2)
        sh = state_shardings(state, mesh)
        state = jax.device_put(state, sh)
        p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        step = jax.jit(make_train_step(model, tx, accum=2),
                       in_shardings=(sh, None, None),
                       out_shardings=(sh, replicated(mesh)))
        sharded = shard_batch(batch, mesh)
        compiled = step.lower(state, sharded, jax.random.PRNGKey(7)).compile()
        bad = [ln.strip()[:120] for ln in compiled.as_text().splitlines()
               if "all-gather" in ln and "32,32,3" in ln]
        assert not bad, f"image batch is all-gathered in the accum split: {bad}"
        s2, loss = compiled(state, sharded, jax.random.PRNGKey(7))
        assert np.isfinite(float(loss))
        p1 = np.asarray(jax.tree_util.tree_leaves(s2.params)[0])
        assert not np.array_equal(p0, p1)


class TestAccumCLI:
    def test_train_e2e_and_batch_rounding(self, tmp_path):
        """TRAIN --accum 3 with --batch 8: batch rounds up to 9 and the
        run completes with the normal artifact contract."""
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            from test_train_loop import make_args

            from ifcb_classifier_tpu.train.loop import do_training
            src = write_image_folder_dataset(str(tmp_path / "ds"),
                                             {"a": 8, "b": 8}, size=(30, 30))
            args = make_args(src, str(tmp_path / "out"), accum=3, emax=1,
                             emin=1)
            ckpt = do_training(args)
            assert os.path.isfile(ckpt)
            # 8 -> 9 (multiple of accum=3), then -> 24 on the test env's
            # 8-device mesh (each micro-batch shards evenly: 8*3)
            assert args.batch_size == 24
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)

    def test_cli_flag_parses(self):
        from ifcb_classifier_tpu.cli import argparse_nn
        args = argparse_nn().parse_args(
            ["TRAIN", "src", "resnet18", "id", "--accum", "4"])
        assert args.accum == 4
        args = argparse_nn().parse_args(["TRAIN", "src", "resnet18", "id"])
        assert args.accum == 1
