"""Mid-training resume + torch weight-port round trips + export round trip."""

import argparse
import csv
import os

import numpy as np
import pytest

from fixtures import make_roi, write_bin, write_image_folder_dataset
from test_train_loop import make_args


class TestResume:
    def test_resume_continues_epochs(self, tmp_path):
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            src = write_image_folder_dataset(str(tmp_path / "ds"),
                                             {"a": 8, "b": 8}, size=(20, 20))
            outdir = str(tmp_path / "out")
            from ifcb_classifier_tpu.train.loop import do_training
            do_training(make_args(src, outdir, emax=2, seed=5))
            # resume for 2 more epochs
            do_training(make_args(src, outdir, emax=4, seed=5, resume=True))
            with open(os.path.join(outdir, "epochs.csv")) as f:
                rows = list(csv.DictReader(f))
            assert [int(r["epoch"]) for r in rows] == [0, 1, 2, 3]
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)

    def test_resume_restores_the_drawn_seed(self, tmp_path):
        """A run launched WITHOUT --seed draws a random one; --resume must
        reuse it (recorded in last.state) — the train/val split membership
        is derived from the seed, so a fresh draw would silently
        regenerate a different split mid-run, leaking trained-on images
        into the new validation set (round-4 review finding). A
        conflicting explicit --seed on resume is rejected loudly."""
        import yaml
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            src = write_image_folder_dataset(str(tmp_path / "ds"),
                                             {"a": 8, "b": 8}, size=(20, 20))
            outdir = str(tmp_path / "out")
            from ifcb_classifier_tpu.train.loop import do_training
            do_training(make_args(src, outdir, emax=1, seed=0))  # no --seed
            lists = {n: open(os.path.join(outdir, n)).read()
                     for n in ("training_images.list",
                               "validation_images.list")}
            with open(os.path.join(outdir, "args.yml")) as f:
                seed0 = yaml.safe_load(f)["seed"]
            assert seed0  # a concrete seed was drawn and recorded
            do_training(make_args(src, outdir, emax=2, seed=0, resume=True))
            with open(os.path.join(outdir, "args.yml")) as f:
                assert yaml.safe_load(f)["seed"] == seed0  # reused, not
            for n, before in lists.items():               # re-drawn
                assert open(os.path.join(outdir, n)).read() == before
            with pytest.raises(ValueError, match="seed"):
                do_training(make_args(src, outdir, emax=3,
                                      seed=seed0 + 1, resume=True))
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)

    def test_noop_resume_of_completed_run_keeps_cursor(self, tmp_path):
        """--resume of an already-completed run must not advance the
        last.state epoch cursor (it used to gain one phantom epoch per
        no-op invocation, silently skipping real epochs when the run was
        later extended with a larger --emax)."""
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            src = write_image_folder_dataset(str(tmp_path / "ds"),
                                             {"a": 8, "b": 8}, size=(20, 20))
            outdir = str(tmp_path / "out")
            from ifcb_classifier_tpu.train.checkpoint import (
                peek_train_state_extra)
            from ifcb_classifier_tpu.train.loop import do_training
            state_path = os.path.join(outdir, "chkpts", "last.state")
            do_training(make_args(src, outdir, emax=2, seed=5))
            assert peek_train_state_extra(state_path)["epoch"] == 1
            for _ in range(2):  # repeated no-op resumes: cursor pinned
                do_training(make_args(src, outdir, emax=2, seed=5,
                                      resume=True))
                assert peek_train_state_extra(state_path)["epoch"] == 1
            # extending afterwards trains EXACTLY the missing epochs
            do_training(make_args(src, outdir, emax=4, seed=5, resume=True))
            with open(os.path.join(outdir, "epochs.csv")) as f:
                rows = list(csv.DictReader(f))
            assert [int(r["epoch"]) for r in rows] == [0, 1, 2, 3]
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)

    def test_resume_rng_stream_continuity(self, tmp_path):
        """Train-4-straight must equal train-2 + resume-2 EXACTLY: the
        carried augmentation/dropout PRNG key is persisted in last.state, so
        a resumed run replays the uninterrupted stream (flips on to make the
        stream observable in the losses)."""
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            src = write_image_folder_dataset(str(tmp_path / "ds"),
                                             {"a": 8, "b": 8}, size=(20, 20))
            out_a = str(tmp_path / "straight")
            out_b = str(tmp_path / "resumed")
            from ifcb_classifier_tpu.train.loop import do_training
            do_training(make_args(src, out_a, emax=4, seed=7, flip="xy"))
            do_training(make_args(src, out_b, emax=2, seed=7, flip="xy"))
            do_training(make_args(src, out_b, emax=4, seed=7, flip="xy",
                                  resume=True))
            rows = {}
            for tag, out in (("a", out_a), ("b", out_b)):
                with open(os.path.join(out, "epochs.csv")) as f:
                    rows[tag] = list(csv.DictReader(f))
            assert rows["a"] == rows["b"]
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)


class TestTorchPort:
    @pytest.mark.parametrize("family,size", [
        ("resnet18", 64), ("densenet121", 64), ("alexnet", 224),
        ("vgg11", 224), ("squeezenet", 224), ("inception_v3", 299),
        ("efficientnet_b0", 224)])
    def test_roundtrip_through_torch_keys(self, family, size, tmp_path):
        """export_state_dict -> .npz -> load_torch_weights must reproduce the
        original trees exactly (validates key mapping + layout transposes
        both ways)."""
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.models.torch_port import (
            export_state_dict, port_state_dict)
        from ifcb_classifier_tpu.train.state import create_train_state

        model = get_namebrand_model(family, 5, dtype=jnp.float32)
        state, _ = create_train_state(model, jax.random.PRNGKey(1), size)
        sd = export_state_dict(family, state.params, state.batch_stats)
        assert all(k.endswith((".weight", ".bias", ".running_mean",
                               ".running_var")) for k in sd)

        # port back into freshly initialized trees (different seed)
        state2, _ = create_train_state(model, jax.random.PRNGKey(2), size)
        new_params, new_stats = port_state_dict(
            family, sd, state2.params, state2.batch_stats, skip_head=False)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(new_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.batch_stats),
                        jax.tree_util.tree_leaves(new_stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_skip_head_preserves_fresh_fc(self):
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.models.torch_port import (
            export_state_dict, port_state_dict)
        from ifcb_classifier_tpu.train.state import create_train_state

        model1000 = get_namebrand_model("resnet18", 1000, dtype=jnp.float32)
        s1000, _ = create_train_state(model1000, jax.random.PRNGKey(1), 64)
        sd = export_state_dict("resnet18", s1000.params, s1000.batch_stats)

        model5 = get_namebrand_model("resnet18", 5, dtype=jnp.float32)
        s5, _ = create_train_state(model5, jax.random.PRNGKey(2), 64)
        new_params, _ = port_state_dict("resnet18", sd, s5.params,
                                        s5.batch_stats, skip_head=True)
        # trunk ported
        np.testing.assert_array_equal(
            np.asarray(new_params["conv1"]["conv"]["kernel"]),
            np.asarray(s1000.params["conv1"]["conv"]["kernel"]))
        # head untouched (fresh init, 5-class)
        np.testing.assert_array_equal(
            np.asarray(new_params["fc"]["kernel"]),
            np.asarray(s5.params["fc"]["kernel"]))


class TestExport:
    def test_stablehlo_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.export import export_model, run_exported
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        from ifcb_classifier_tpu.train.state import (create_train_state,
                                                     make_predict_step)

        model = get_namebrand_model("squeezenet", 3, dtype=jnp.float32)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), 64)
        ckpt = str(tmp_path / "m.ptl")
        save_checkpoint(ckpt, state.params, state.batch_stats,
                        dict(MODEL="squeezenet", classes=["x", "y", "z"],
                             resize=64, model_id="m", seed=1, img_norm=None))
        out = export_model(ckpt, str(tmp_path / "m.stablehlo"), batchsize=4)
        assert os.path.isfile(out)
        assert open(out + ".classes").read().splitlines() == ["x", "y", "z"]

        src = write_image_folder_dataset(str(tmp_path / "imgs"), {"c": 4},
                                         size=(32, 32))
        scores, paths = run_exported(out, src, batch_size=4)
        assert scores.shape == (4, 3)
        np.testing.assert_allclose(scores.sum(1), 1.0, atol=1e-4)

        # parity with direct prediction
        predict = make_predict_step(model)
        from ifcb_classifier_tpu.data.pipeline import decode_image, pack_canvas_batch
        from ifcb_classifier_tpu.ops.preprocess import preprocess_batch
        imgs = [decode_image(p) for p in sorted(paths)]
        canvas, sizes, _ = pack_canvas_batch(imgs, batch_size=4)
        x = preprocess_batch(canvas, sizes, out_size=64)
        direct = np.asarray(predict(state.params, state.batch_stats, x))
        order = np.argsort(paths)
        np.testing.assert_allclose(scores[order], direct, atol=1e-4)


class TestExportInt8:
    """EXPORT --precision int8: the post-training-quantized graph baked
    into the StableHLO artifact with activation scales calibrated once at
    export time (export.py:export_model). Covers both calibration sources
    (image folder / bin directory) and both int8 graph variants
    (interceptor via resnet18, resident via inception_v3)."""

    def _ckpt(self, tmp_path, name="resnet18", n=3, resize=32):
        import jax
        import jax.numpy as jnp

        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        from ifcb_classifier_tpu.train.state import create_train_state

        model = get_namebrand_model(name, n, dtype=jnp.float32)
        if name == "inception_v3":
            # eval-mode init: the aux tower needs 299² under train=True,
            # and inference artifacts never run it
            v = model.init(jax.random.PRNGKey(4),
                           jnp.zeros((1, resize, resize, 3), jnp.float32),
                           train=False)
            params, stats = v["params"], v["batch_stats"]
        else:
            state, _ = create_train_state(model, jax.random.PRNGKey(4),
                                          resize)
            params, stats = state.params, state.batch_stats
        p = str(tmp_path / "m.ptl")
        save_checkpoint(p, params, stats,
                        dict(MODEL=name, classes=list("abc")[:n],
                             resize=resize, model_id="m", seed=1,
                             img_norm=None))
        return p

    def test_int8_export_runs_and_matches_fp32_argmax(self, tmp_path):
        from ifcb_classifier_tpu.export import export_model, run_exported

        ckpt = self._ckpt(tmp_path)
        src = write_image_folder_dataset(str(tmp_path / "imgs"), {"c": 4},
                                         size=(28, 28))
        q = export_model(ckpt, str(tmp_path / "m.int8.stablehlo"),
                         batchsize=4, precision="int8", calib=src)
        f = export_model(ckpt, str(tmp_path / "m.fp32.stablehlo"),
                         batchsize=4)
        import json as _json
        meta = _json.load(open(q + ".json"))
        assert meta["precision"] == "int8" and meta["calib_src"]
        sq, pq = run_exported(q, src, batch_size=4)
        sf, pf = run_exported(f, src, batch_size=4)
        assert sq.shape == sf.shape == (4, 3)
        np.testing.assert_allclose(sq.sum(1), 1.0, atol=1e-3)
        oq = np.argsort(pq)
        of = np.argsort(pf)
        assert np.abs(sq[oq] - sf[of]).max() < 2e-2  # the PTQ gate
        assert (sq[oq].argmax(1) == sf[of].argmax(1)).all()

    @pytest.mark.parametrize("schema", [2, 1])
    def test_int8_export_calibrates_from_bins(self, tmp_path, schema):
        """Both bin schemas; schema-1 calibration must run the SAME
        stitching the serving path applies (export._load_calib_batch
        uses infilled_images, like predict_bin)."""
        from ifcb_classifier_tpu.export import export_model

        ckpt = self._ckpt(tmp_path)
        bins = tmp_path / "bins"
        bins.mkdir()
        pid = ("D20240401T000000_IFCB900" if schema == 2
               else "IFCB1_2024_092_000000")
        write_bin(str(bins), pid,
                  [make_roi(20 + i, 24, seed=i) for i in range(5)],
                  schema=schema)
        out = export_model(ckpt, str(tmp_path / "m.int8.stablehlo"),
                           batchsize=2, precision="int8", calib=str(bins),
                           calib_count=4)
        assert os.path.isfile(out)

    def test_int8_export_flagship_resident_graph(self, tmp_path):
        """inception_v3 (folded) exports through the int8-RESIDENT graph
        (models/quant_graph.py) — the deployment artifact for the
        flagship."""
        from ifcb_classifier_tpu.export import export_model, run_exported

        ckpt = self._ckpt(tmp_path, name="inception_v3", resize=75)
        src = write_image_folder_dataset(str(tmp_path / "imgs"), {"c": 2},
                                         size=(40, 40))
        out = export_model(ckpt, str(tmp_path / "i.int8.stablehlo"),
                           batchsize=2, precision="int8", calib=src,
                           calib_count=2)
        scores, _ = run_exported(out, src, batch_size=2)
        assert scores.shape == (2, 3)
        np.testing.assert_allclose(scores.sum(1), 1.0, atol=1e-3)

    def test_int8_export_requires_calib(self, tmp_path):
        from ifcb_classifier_tpu.export import export_model
        with pytest.raises(ValueError, match="--calib"):
            export_model(self._ckpt(tmp_path), precision="int8")

    def test_int8_export_rejects_unsupported_family(self, tmp_path):
        from ifcb_classifier_tpu.export import export_model
        ckpt = self._ckpt(tmp_path, name="squeezenet")
        with pytest.raises(ValueError, match="int8"):
            export_model(ckpt, precision="int8", calib=str(tmp_path))


class TestHeadDetection:
    def test_vgg_hidden_classifier_layers_port(self):
        """vgg/alexnet classifier.0/.3 (hidden Linears) are pretrained trunk
        and MUST port; only classifier.6 is the re-sized head
        (neuston_models.py:34-36)."""
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.models.torch_port import (
            export_state_dict, port_state_dict)
        from ifcb_classifier_tpu.train.state import create_train_state

        m1000 = get_namebrand_model("vgg11", 1000, dtype=jnp.float32)
        s1000, _ = create_train_state(m1000, jax.random.PRNGKey(1), 224)
        sd = export_state_dict("vgg11", s1000.params, s1000.batch_stats)
        assert "classifier.0.weight" in sd and "classifier.6.weight" in sd

        m5 = get_namebrand_model("vgg11", 5, dtype=jnp.float32)
        s5, _ = create_train_state(m5, jax.random.PRNGKey(2), 224)
        new_params, _ = port_state_dict("vgg11", sd, s5.params,
                                        s5.batch_stats, skip_head=True)
        np.testing.assert_array_equal(  # hidden layer ported
            np.asarray(new_params["classifier_0"]["kernel"]),
            np.asarray(s1000.params["classifier_0"]["kernel"]))
        np.testing.assert_array_equal(  # head untouched
            np.asarray(new_params["classifier_6"]["kernel"]),
            np.asarray(s5.params["classifier_6"]["kernel"]))

    def test_efficientnet_torchvision_key_shapes(self):
        """Exported efficientnet keys follow torchvision's features.N layout."""
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.models.torch_port import export_state_dict
        from ifcb_classifier_tpu.train.state import create_train_state

        m = get_namebrand_model("efficientnet_b0", 7, dtype=jnp.float32)
        s, _ = create_train_state(m, jax.random.PRNGKey(0), 64)
        sd = export_state_dict("efficientnet_b0", s.params, s.batch_stats)
        assert "features.0.0.weight" in sd          # stem conv
        assert "features.1.0.block.0.0.weight" in sd  # stage0 dwconv (no expand)
        assert "features.2.0.block.0.0.weight" in sd  # stage1 expand conv
        assert "features.2.0.block.2.fc1.weight" in sd  # SE
        assert "features.8.0.weight" in sd          # head conv
        assert "classifier.1.weight" in sd


class TestShardManifest:
    def test_equal_lengths_across_hosts(self, monkeypatch):
        import jax
        from ifcb_classifier_tpu.parallel import distributed
        items = [f"i{k}" for k in range(13)]
        labels = list(range(13))
        lens, reals = [], []
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        for p in range(4):
            monkeypatch.setattr(jax, "process_index", lambda p=p: p)
            it, lb, n_real = distributed.shard_manifest(items, labels)
            assert len(it) == len(lb) == 4  # ceil(13/4), padded
            lens.append(len(it))
            reals.append(n_real)
            assert it[n_real:] == [it[0]] * (4 - n_real)  # pads repeat item 0
        assert len(set(lens)) == 1
        assert reals == [4, 3, 3, 3]  # real counts sum to N, no double count
        assert sum(reals) == 13

    def test_real_items_partition_manifest(self, monkeypatch):
        """Union of the REAL (unpadded) slices is exactly the manifest — each
        item classified once across the fleet."""
        import jax
        from ifcb_classifier_tpu.parallel import distributed
        items = [f"i{k}" for k in range(10)]
        monkeypatch.setattr(jax, "process_count", lambda: 3)
        seen = []
        for p in range(3):
            monkeypatch.setattr(jax, "process_index", lambda p=p: p)
            it, _, n_real = distributed.shard_manifest(items)
            seen.extend(it[:n_real])
        assert sorted(seen) == sorted(items)


class TestReconstructGlobalRows:
    def _make_case(self):
        """N=10 items over P=4 hosts, B_local=2 → per_host=3, 2 local batches.
        Hosts 2,3 carry one manifest pad each (masked → ns=0 in batch 1).
        probs row for global item g is one-hot(g); pad rows are -1 garbage."""
        import numpy as np
        P, BL, N, C = 4, 2, 10, 10
        n_real = [3, 3, 2, 2]
        ns = np.array([[2, 1], [2, 1], [2, 0], [2, 0]], np.int32)
        idx = np.full((P, 2, BL), -1, np.int32)
        probs_batches = [np.full((P * BL, C), -1.0, np.float32)
                         for _ in range(2)]
        for p in range(P):
            for bi in range(2):
                for k in range(int(ns[p][bi])):
                    li = bi * BL + k
                    g = p + li * P
                    idx[p, bi, k] = li
                    probs_batches[bi][p * BL + k] = np.eye(C)[g]
        return probs_batches, ns, idx, P, BL, N

    def test_round_trip_with_pads(self):
        import numpy as np
        from ifcb_classifier_tpu.parallel.distributed import (
            reconstruct_global_rows)
        probs_batches, ns, idx, P, BL, N = self._make_case()
        probs, glob = reconstruct_global_rows(probs_batches, ns, idx, P, BL, N)
        assert sorted(glob) == list(range(N))
        for row, g in zip(probs, glob):
            np.testing.assert_array_equal(row, np.eye(N)[g])

    def test_defensive_drop_of_out_of_range(self):
        """Even if a ns miscount lets a pad row through (li maps past the
        manifest), reconstruction drops it instead of raising IndexError —
        the ADVICE round-1 failure (N=10, P=4 → g=11)."""
        from ifcb_classifier_tpu.parallel.distributed import (
            reconstruct_global_rows)
        probs_batches, ns, idx, P, BL, N = self._make_case()
        ns = ns.copy()
        ns[3, 1] = 1          # host 3 claims its pad row is real
        idx[3, 1, 0] = 2      # local idx 2 → g = 3 + 2*4 = 11 >= N
        probs, glob = reconstruct_global_rows(probs_batches, ns, idx, P, BL, N)
        assert sorted(glob) == list(range(N))  # pad dropped, no IndexError


def test_tree_float32_casts_bf16():
    """numpy's issubdtype treats bfloat16 as non-float (kind 'V') — the
    helper must still cast it (review finding)."""
    import jax.numpy as jnp
    import numpy as np
    from ifcb_classifier_tpu.train.checkpoint import tree_float32
    tree = {"w": jnp.ones((3,), jnp.bfloat16), "i": np.arange(3),
            "f": np.ones(2, np.float16)}
    out = tree_float32(tree)
    assert out["w"].dtype == np.float32
    assert out["f"].dtype == np.float32
    assert out["i"].dtype == np.int64 or out["i"].dtype == np.dtype("int64")


def test_run_exported_rejects_raw_checkpoint(tmp_path):
    from ifcb_classifier_tpu.export import run_exported
    p = tmp_path / "m.ptl"
    p.write_bytes(b"\x81\xa4junk")
    import pytest
    with pytest.raises(ValueError, match="raw checkpoint"):
        run_exported(str(p), str(tmp_path))


class TestExportFolding:
    def test_export_folds_bn_and_scores_match(self, tmp_path):
        """EXPORT bakes the BN-folded graph into the artifact (engine-default
        parity); scores match the unfolded model within float rounding."""
        import json as _json

        import jax
        import jax.numpy as jnp
        from test_fold import _randomized_variables

        from ifcb_classifier_tpu.export import export_model, run_exported
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        from ifcb_classifier_tpu.train.state import make_predict_step

        model = get_namebrand_model("resnet18", 3, dtype=jnp.float32)
        params, stats = _randomized_variables(model, jax.random.PRNGKey(1),
                                              64)
        ckpt = str(tmp_path / "m.ptl")
        save_checkpoint(ckpt, params, stats,
                        dict(MODEL="resnet18", classes=["x", "y", "z"],
                             resize=64, model_id="m", seed=1, img_norm=None))
        out = export_model(ckpt, str(tmp_path / "m.stablehlo"), batchsize=4)
        meta = _json.load(open(out + ".json"))
        assert meta["bn_folded"] is True

        src = write_image_folder_dataset(str(tmp_path / "imgs"), {"c": 4},
                                         size=(32, 32))
        scores, paths = run_exported(out, src, batch_size=4)
        assert scores.shape == (4, 3)

        # parity vs the UNFOLDED model on the same preprocessed batch
        from ifcb_classifier_tpu.data.pipeline import (decode_image,
                                                       pack_canvas_batch)
        from ifcb_classifier_tpu.ops.preprocess import preprocess_batch
        predict = make_predict_step(model)
        imgs = [decode_image(p) for p in sorted(paths)]
        canvas, sizes, _ = pack_canvas_batch(imgs, batch_size=4)
        x = preprocess_batch(canvas, sizes, out_size=64)
        direct = np.asarray(predict(params, stats, x))
        order = np.argsort(paths)
        np.testing.assert_allclose(scores[order], direct, atol=1e-3)


class _NotAllowlisted:
    """Stand-in for an attacker-controlled class pickled into a .ptl; the
    tolerant unpickler must refuse to resolve it (module-level so pickle
    can reference it by module+name)."""


class TestLoadHparams:
    """load_hparams: submit-time hparams read with NO weight port (sbatch
    resolves {MODEL_ID} on a login node; porting hundreds of MB there was
    the round-5 review finding)."""

    def test_native_checkpoint(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import (load_hparams,
                                                          save_checkpoint)
        from ifcb_classifier_tpu.train.state import create_train_state
        model = get_namebrand_model("resnet18", 2, dtype=jnp.float32)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), 32)
        p = str(tmp_path / "m.ptl")
        save_checkpoint(p, state.params, state.batch_stats,
                        dict(MODEL="resnet18", classes=["a", "b"],
                             resize=32, model_id="mid7", seed=1,
                             img_norm=None))
        hp = load_hparams(p)
        assert hp["model_id"] == "mid7" and hp["MODEL"] == "resnet18"

    def test_lightning_checkpoint_skips_the_port(self, tmp_path,
                                                 monkeypatch):
        """For a .ptl the hparams read must NOT run the tensor-by-tensor
        port (that is the heavy step): poison port_state_dict and assert
        load_hparams still succeeds through the hardened unpickler."""
        from ifcb_classifier_tpu.models import torch_port
        from ifcb_classifier_tpu.train.checkpoint import load_hparams
        p = str(tmp_path / "ref.ptl")
        TestLightningCheckpoint()._fake_ptl(p)
        monkeypatch.setattr(
            torch_port, "port_state_dict",
            lambda *a, **k: (_ for _ in ()).throw(
                AssertionError("load_hparams ran the weight port")))
        hp = load_hparams(p)
        assert hp["model_id"] == "ptl_twin"
        assert hp["MODEL"] == "resnet18"

    def test_non_checkpoint_raises(self, tmp_path):
        from ifcb_classifier_tpu.train.checkpoint import load_hparams
        p = tmp_path / "junk.ptl"
        p.write_bytes(b"not a checkpoint at all")
        with pytest.raises(Exception):
            load_hparams(str(p))


class TestEngineModelIdFallback:
    def test_missing_model_id_uses_ckpt_stem(self, tmp_path):
        """Engine model_id falls back to the checkpoint basename (sbatch's
        submit-time fallback) — None crashed the .h5/.mat writers after
        classification and diverged runtime outdirs from submit-time."""
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        from ifcb_classifier_tpu.train.state import create_train_state
        model = get_namebrand_model("resnet18", 2, dtype=jnp.float32)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), 32)
        p = str(tmp_path / "migrated_model.ptl")
        save_checkpoint(p, state.params, state.batch_stats,
                        dict(MODEL="resnet18", classes=["a", "b"],
                             resize=32, seed=1, img_norm=None))  # no model_id
        eng = InferenceEngine(p, batch_size=4)
        assert eng.model_id == "migrated_model"


class TestLightningCheckpoint:
    """Direct RUN/EXPORT consumption of the reference's .ptl artifacts
    (train/checkpoint.py:_load_lightning_checkpoint). The fabricated ckpt
    mirrors what PTL 1.3.8 writes for a NeustonModel: state_dict with
    'model.'-prefixed torch tensors + the full args namespace under
    hyper_parameters (neuston_models.py:50-56)."""

    def _fake_ptl(self, path, n_classes=3, seed=1, attr_dict=False):
        import jax
        import jax.numpy as jnp
        import torch

        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.models.torch_port import export_state_dict
        from ifcb_classifier_tpu.train.state import create_train_state

        model = get_namebrand_model("resnet18", n_classes, dtype=jnp.float32)
        state, _ = create_train_state(model, jax.random.PRNGKey(seed), 32)
        sd = {"model." + k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in export_state_dict(
                  "resnet18", state.params, state.batch_stats).items()}
        hp = {"MODEL": "resnet18", "classes": list("abc")[:n_classes],
              "resize": 32, "img_norm": None, "seed": 11,
              "model_id": "ptl_twin", "pretrained": False,
              "TRAIN_ID": "ptl_twin", "cmd": "TRAIN"}
        if attr_dict:
            # simulate Lightning's AttributeDict (a dict subclass from a
            # module NOT installed here): register a throwaway module for
            # pickling, drop it before load so the tolerant unpickler has
            # to map it back to dict
            import sys
            import types
            mod = types.ModuleType("pytorch_lightning")
            sub = types.ModuleType("pytorch_lightning.utilities")
            leaf = types.ModuleType("pytorch_lightning.utilities.parsing")

            class AttributeDict(dict):
                pass

            AttributeDict.__module__ = "pytorch_lightning.utilities.parsing"
            AttributeDict.__qualname__ = "AttributeDict"
            leaf.AttributeDict = AttributeDict
            sys.modules.update({"pytorch_lightning": mod,
                                "pytorch_lightning.utilities": sub,
                                "pytorch_lightning.utilities.parsing": leaf})
            try:
                torch.save({"state_dict": sd,
                            "hyper_parameters": AttributeDict(hp)}, path)
            finally:
                for k in ("pytorch_lightning.utilities.parsing",
                          "pytorch_lightning.utilities",
                          "pytorch_lightning"):
                    sys.modules.pop(k, None)
        else:
            torch.save({"state_dict": sd, "hyper_parameters": hp}, path)
        return state

    @pytest.mark.parametrize("attr_dict", [False, True])
    def test_ptl_load_roundtrip(self, tmp_path, attr_dict):
        import jax
        from ifcb_classifier_tpu.train.checkpoint import load_checkpoint

        path = str(tmp_path / "model.ptl")
        state = self._fake_ptl(path, attr_dict=attr_dict)
        params, stats, hparams = load_checkpoint(path)
        assert hparams["MODEL"] == "resnet18"
        assert hparams["classes"] == ["a", "b", "c"]
        assert hparams["resize"] == 32
        assert hparams["model_id"] == "ptl_twin"
        assert hparams["seed"] == 11
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.batch_stats),
                        jax.tree_util.tree_leaves(stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ptl_engine_scores_match_native_ckpt(self, tmp_path):
        """The SAME weights served from a .ptl and from a native checkpoint
        must produce identical scores through the full engine path."""
        import jax
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint

        ptl = str(tmp_path / "model.ptl")
        self._fake_ptl(ptl)
        params, stats, hparams = __import__(
            "ifcb_classifier_tpu.train.checkpoint",
            fromlist=["load_checkpoint"]).load_checkpoint(ptl)
        native = str(tmp_path / "model.ckpt")
        save_checkpoint(native, params, stats, hparams)

        rng = np.random.RandomState(0)
        imgs = [rng.randint(0, 255, (24, 31), np.uint8) for _ in range(5)]
        e1 = InferenceEngine(ptl, batch_size=8)
        e2 = InferenceEngine(native, batch_size=8)
        s1 = np.asarray(e1.predict_images(imgs))
        s2 = np.asarray(e2.predict_images(imgs))
        np.testing.assert_allclose(s1, s2, atol=1e-6)

    def test_non_checkpoint_file_raises(self, tmp_path):
        from ifcb_classifier_tpu.train.checkpoint import load_checkpoint
        bad = str(tmp_path / "junk.ptl")
        with open(bad, "wb") as f:
            f.write(b"this is not a checkpoint of any kind")
        with pytest.raises(ValueError):
            load_checkpoint(bad)

    def test_msgpack_scalar_file_raises_valueerror(self, tmp_path):
        """A file whose bytes decode as a bare msgpack scalar must hit the
        documented ValueError, not an AttributeError on payload.get."""
        from ifcb_classifier_tpu.train.checkpoint import load_checkpoint
        bad = str(tmp_path / "scalar.ckpt")
        with open(bad, "wb") as f:
            f.write(b"\x01")  # msgpack: the integer 1
        with pytest.raises(ValueError):
            load_checkpoint(bad)

    def test_ptl_with_missing_trunk_keys_raises(self, tmp_path):
        """The .ptl porting template is zeros, so an incomplete state_dict
        (layout drift, stripped keys) must fail loudly instead of serving
        zero-weight garbage scores."""
        import torch

        from ifcb_classifier_tpu.train.checkpoint import load_checkpoint
        path = str(tmp_path / "model.ptl")
        self._fake_ptl(path)
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        dropped = [k for k in ckpt["state_dict"] if "layer1" in k]
        assert dropped
        for k in dropped:
            del ckpt["state_dict"][k]
        torch.save(ckpt, path)
        with pytest.raises(ValueError, match="partial port"):
            load_checkpoint(path)

    def test_ptl_with_non_allowlisted_class_refuses(self, tmp_path):
        """The tolerant unpickler is an allowlist: a checkpoint carrying an
        arbitrary class (the arbitrary-code-execution vector torch's
        weights_only=True exists to block) must refuse to load."""
        import torch

        from ifcb_classifier_tpu.train.checkpoint import load_checkpoint
        path = str(tmp_path / "evil.ptl")
        torch.save({"state_dict": {}, "hyper_parameters": {
            "MODEL": "resnet18", "classes": ["a"],
            "gadget": _NotAllowlisted()}}, path)
        with pytest.raises(ValueError, match="allowlisted"):
            load_checkpoint(path)
