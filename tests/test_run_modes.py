"""RUN-mode coverage the reference never had (its .txt-list / single-bin
paths are literally marked '# TODO TEST', neuston_net.py:220,225): bin lists,
single bin, IN/OUT filters, clobber/skip, {epoch} results patterns."""

import argparse
import json
import os
import time

import numpy as np
import pytest

from fixtures import make_roi, write_bin, write_image_folder_dataset


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import jax
    import jax.numpy as jnp
    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
    from ifcb_classifier_tpu.train.state import create_train_state

    model = get_namebrand_model("resnet18", 2, dtype=jnp.float32)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), 32)
    p = str(tmp_path_factory.mktemp("ck") / "m.ptl")
    save_checkpoint(p, state.params, state.batch_stats,
                    dict(MODEL="resnet18", classes=["a", "b"], resize=32,
                         model_id="m", seed=1, img_norm=None))
    return p


def run_args(src, ckpt, outdir, **kw):
    d = dict(cmd_mode="RUN", SRC=src, MODEL=ckpt, RUN_ID="r", batch_size=8,
             loaders=1, src_type="bin", outdir=outdir,
             outfile=["{BIN_ID}.json"], filter=None, clobber=False,
             gobig=False, cmd_timestamp="2026-08-16T00:00:00+00:00")
    d.update(kw)
    return argparse.Namespace(**d)


@pytest.fixture(scope="module")
def bin_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("bins")
    for i, sub in enumerate(["x", "x", "y"]):
        write_bin(str(root / sub), f"D2024010{i + 1}T000000_IFCB900",
                  [make_roi(16, 20, i), make_roi(10, 10, i + 7)], 2)
    return root


class TestBinModes:
    def test_txt_bin_list(self, ckpt, bin_tree, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        lst = tmp_path / "bins.txt"
        lst.write_text("{}\n{}\n".format(
            bin_tree / "x" / "D20240101T000000_IFCB900",
            bin_tree / "y" / "D20240103T000000_IFCB900"))
        out = str(tmp_path / "out")
        do_run(run_args(str(lst), ckpt, out))
        done = sorted(os.listdir(out))
        assert done == ["D20240101T000000_IFCB900.json",
                        "D20240103T000000_IFCB900.json"]

    def test_single_bin(self, ckpt, bin_tree, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        out = str(tmp_path / "out")
        do_run(run_args(str(bin_tree / "y" / "D20240103T000000_IFCB900.adc"),
                        ckpt, out))
        assert os.listdir(out) == ["D20240103T000000_IFCB900.json"]

    def test_filter_out(self, ckpt, bin_tree, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        out = str(tmp_path / "out")
        do_run(run_args(str(bin_tree), ckpt, out,
                        filter=["OUT", "D20240102"]))
        assert sorted(os.listdir(out)) == ["D20240101T000000_IFCB900.json",
                                           "D20240103T000000_IFCB900.json"]

    def test_filter_in_from_keyword_file(self, ckpt, bin_tree, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        kws = tmp_path / "k.txt"
        kws.write_text("D20240102\n")
        out = str(tmp_path / "out")
        do_run(run_args(str(bin_tree), ckpt, out, filter=["IN", str(kws)]))
        assert os.listdir(out) == ["D20240102T000000_IFCB900.json"]

    def test_skip_existing_unless_clobber(self, ckpt, bin_tree, tmp_path,
                                          capsys):
        from ifcb_classifier_tpu.infer.runner import do_run
        out = str(tmp_path / "out")
        do_run(run_args(str(bin_tree), ckpt, out))
        stamps = {f: os.path.getmtime(os.path.join(out, f))
                  for f in os.listdir(out)}
        do_run(run_args(str(bin_tree), ckpt, out))
        assert "already exist - skipping" in capsys.readouterr().out
        for f, t in stamps.items():
            assert os.path.getmtime(os.path.join(out, f)) == t
        do_run(run_args(str(bin_tree), ckpt, out, clobber=True))
        assert any(os.path.getmtime(os.path.join(out, f)) > t
                   for f, t in stamps.items())

    def test_namespace_subdirs_pattern(self, ckpt, bin_tree, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        out = str(tmp_path / "out")
        do_run(run_args(str(bin_tree), ckpt, out,
                        outfile=["{INPUT_SUBDIRS}/{BIN_ID}.json"]))
        assert os.path.isfile(os.path.join(
            out, "x", "D20240101T000000_IFCB900.json"))
        assert os.path.isfile(os.path.join(
            out, "y", "D20240103T000000_IFCB900.json"))


class TestEpochPattern:
    def test_results_epoch_pattern(self, tmp_path):
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            from test_train_loop import make_args
            from ifcb_classifier_tpu.train.loop import do_training
            src = write_image_folder_dataset(str(tmp_path / "ds"),
                                             {"a": 6, "b": 6}, size=(20, 20))
            args = make_args(src, str(tmp_path / "out"), emax=2, seed=9,
                             result_files=[["res_e{epoch}.json",
                                            "output_scores"]])
            do_training(args)
            written = [f for f in os.listdir(tmp_path / "out")
                       if f.startswith("res_e")]
            assert written  # at least the first best epoch
            with open(tmp_path / "out" / sorted(written)[0]) as f:
                assert "output_scores" in json.load(f)
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)


class TestWatchMode:
    """--watch continuous serving (beyond-reference): rescan-per-pass, bin
    arrival between passes, quiescence deferral, flag validation."""

    def test_new_bin_picked_up_between_passes(self, ckpt, tmp_path,
                                              monkeypatch):
        import time as real_time
        from ifcb_classifier_tpu.infer import runner

        root = tmp_path / "bins"
        write_bin(str(root), "D20240401T000000_IFCB900",
                  [make_roi(16, 20, 1), make_roi(10, 10, 2)], 2)

        class FakeTime:
            def __init__(self):
                self.sleeps = 0
            def time(self):  # far future → every bin counts as quiescent
                return real_time.time() + 1e6
            def sleep(self, s):
                self.sleeps += 1
                if self.sleeps == 1:  # a new bin arrives between passes
                    write_bin(str(root), "D20240402T000000_IFCB900",
                              [make_roi(12, 12, 3)], 2)

        ft = FakeTime()
        monkeypatch.setattr(runner, "time", ft)
        out = str(tmp_path / "out")
        runner.do_run(run_args(str(root), ckpt, out, watch=0.01,
                               watch_passes=3))
        assert ft.sleeps == 2
        done = sorted(os.listdir(out))
        assert done == ["D20240401T000000_IFCB900.json",
                        "D20240402T000000_IFCB900.json"]

    def test_quiescence_defers_fresh_bins(self, ckpt, tmp_path, monkeypatch):
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        write_bin(str(root), "D20240403T000000_IFCB900",
                  [make_roi(16, 20, 1)], 2)  # mtime = now → not quiescent
        out = str(tmp_path / "out")
        monkeypatch.setattr(runner.time, "sleep", lambda s: None)
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=1))
        assert not os.path.isdir(out) or not os.listdir(out)
        # age the bin files past the interval → classified on the next run
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (1, 1))
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=1))
        assert os.listdir(out) == ["D20240403T000000_IFCB900.json"]

    def test_watch_clobber_mutually_exclusive(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        root = tmp_path / "bins"
        write_bin(str(root), "D20240404T000000_IFCB900",
                  [make_roi(8, 8, 0)], 2)
        with pytest.raises(ValueError, match="mutually exclusive"):
            do_run(run_args(str(root), ckpt, str(tmp_path / "out"),
                            watch=1.0, watch_passes=1, clobber=True))

    def test_watch_requires_directory(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        lst = tmp_path / "bins.txt"
        lst.write_text("whatever\n")
        with pytest.raises(ValueError, match="directory"):
            do_run(run_args(str(lst), ckpt, str(tmp_path / "out"),
                            watch=1.0, watch_passes=1))

    def test_cli_parses_watch(self):
        from ifcb_classifier_tpu.cli import argparse_nn
        a = argparse_nn().parse_args(
            ["RUN", "src", "m.ptl", "rid", "--watch", "30"])
        assert a.watch == 30.0 and a.watch_passes is None


class TestRunProfile:
    def test_bin_mode_trace_written(self, ckpt, bin_tree, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        out = str(tmp_path / "out")
        do_run(run_args(str(bin_tree), ckpt, out, profile=1))
        prof = os.path.join(out, "profile")
        assert os.path.isdir(prof)
        found = [f for _, _, fs in os.walk(prof) for f in fs]
        assert found  # a trace artifact exists

    def test_img_mode_trace_written(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        src = write_image_folder_dataset(str(tmp_path / "imgs"), {"a": 3},
                                         size=(30, 30))
        out = str(tmp_path / "out")
        do_run(run_args(src, ckpt, out, src_type="img",
                        outfile=["img_results.json"], profile=1))
        assert os.path.isdir(os.path.join(out, "profile"))


class TestWatchMultiHostSharding:
    def test_pid_hash_ownership_disjoint_and_complete(self, ckpt, tmp_path,
                                                      monkeypatch):
        """Watch mode shards bins by pid hash (stable under rescans that
        shift enumeration order). Simulate a 2-process fleet: each process's
        pass must classify a disjoint subset, and the union must be all
        bins."""
        import jax
        from ifcb_classifier_tpu.infer import runner

        root = tmp_path / "bins"
        pids = [f"D2024080{i}T000000_IFCB900" for i in range(1, 6)]
        for i, pid in enumerate(pids):
            write_bin(str(root), pid, [make_roi(10 + i, 12, i)], 2)
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (1, 1))  # quiescent
        monkeypatch.setattr(runner.time, "sleep", lambda s: None)

        outs = []
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        for idx in (0, 1):
            monkeypatch.setattr(jax, "process_index", lambda i=idx: i)
            out = str(tmp_path / f"out{idx}")
            runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                                   watch_passes=1))
            outs.append(set(os.listdir(out)) if os.path.isdir(out) else set())
        assert outs[0] & outs[1] == set()
        assert outs[0] | outs[1] == {p + ".json" for p in pids}
        assert outs[0] and outs[1]  # 5 bins over 2 hosts: both get work


class TestWatchFleetResize:
    def test_resized_fleet_drops_non_owned_sidecar_entries(
            self, ckpt, tmp_path, monkeypatch):
        """Restarting a watch fleet at a DIFFERENT size reshuffles the
        pid-hash ownership; each rank must drop sidecar contributions for
        bins it no longer owns — resuming them double-counted those ROIs
        fleet-wide (the new owner reclassifies them into ITS aggregate)
        and the stale copy could never update or evict while the bin
        stayed on disk (round-5 review)."""
        import zlib

        import jax
        from ifcb_classifier_tpu.infer import runner

        root = tmp_path / "bins"
        pids = [f"D2024110{i}T000000_IFCB900" for i in range(1, 7)]
        for i, pid in enumerate(pids):
            write_bin(str(root), pid, [make_roi(10 + i, 12, i)], 2)
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (1, 1))
        monkeypatch.setattr(runner.time, "sleep", lambda s: None)
        out = str(tmp_path / "out")

        # 1-process service first: rank 0 owns EVERY bin's contribution
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=1, summary="live.json"))
        s1 = json.load(open(os.path.join(out, "live.json")))
        assert s1["n_bins_done"] == 6
        # its sidecar is the un-suffixed single-process one; a 2-proc
        # restart reads the rank-suffixed path, so seed rank 0's sidecar
        # from it to simulate the same-rank restart
        os.replace(os.path.join(out, ".watch_state.json"),
                   os.path.join(out, ".watch_state.r0.json"))

        # restart as rank 0 of TWO processes: only its owned pids resume
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=1, summary="live.json"))
        own0 = [p for p in pids if zlib.crc32(p.encode()) % 2 == 0]
        s2 = json.load(open(os.path.join(out, "live.r0.json")))
        assert s2["n_bins_done"] == len(own0)
        st = json.load(open(os.path.join(out, ".watch_state.r0.json")))
        assert sorted(st["contrib"]) == sorted(own0)


class TestRound5RunnerFixes:
    def test_empty_bin_list_raises_not_silent(self, ckpt, tmp_path):
        """An empty .txt bin list must raise (the assert vanished under
        python -O, printing 'RUN IS DONE (0 bins)' with exit 0)."""
        from ifcb_classifier_tpu.infer import runner
        lst = tmp_path / "bins.txt"
        lst.write_text("\n  \n")
        with pytest.raises(ValueError, match="bin list is empty"):
            runner.do_run(run_args(str(lst), ckpt, str(tmp_path / "o")))

    def test_none_seed_hparam_degrades_to_zero(self, tmp_path):
        """Migrated .ptl checkpoints materialize seed=None (the key
        exists) — dict.get's default never applied and random.seed(None)
        seeded from OS entropy."""
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        from ifcb_classifier_tpu.train.state import create_train_state
        model = get_namebrand_model("resnet18", 2, dtype=jnp.float32)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), 32)
        p = str(tmp_path / "m.ptl")
        save_checkpoint(p, state.params, state.batch_stats,
                        dict(MODEL="resnet18", classes=["a", "b"],
                             resize=32, model_id="m", seed=None,
                             img_norm=None))
        assert InferenceEngine(p, batch_size=4).seed == 0

    def test_calib_batches_zero_is_refused(self, ckpt):
        from ifcb_classifier_tpu.cli import argparse_nn
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        args = argparse_nn().parse_args(
            ["--precision", "int8", "RUN", "src", ckpt, "rid",
             "--calib-batches", "0"])
        with pytest.raises(ValueError, match="must be >= 1"):
            InferenceEngine.from_args(args)


class TestGobigAggregation:
    """--gobig as real cross-bin batch aggregation (reference: one
    aggregated Trainer run, neuston_net.py:261-271; here: shared full
    canvas batches, per-bin files/errors preserved)."""

    def _mkbins(self, root, n=3, rois=5):
        pids = []
        for b in range(n):
            pid = f"D2024090{b + 1}T000000_IFCB900"
            write_bin(str(root), pid,
                      [make_roi(14 + b, 16, seed=b * 10 + r)
                       for r in range(rois)], 2)
            pids.append(pid)
        return pids

    def test_parity_with_per_bin_path(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        root = tmp_path / "bins"
        pids = self._mkbins(root)
        out_a = str(tmp_path / "perbin")
        out_b = str(tmp_path / "gobig")
        do_run(run_args(str(root), ckpt, out_a))
        do_run(run_args(str(root), ckpt, out_b, gobig=True))
        assert sorted(os.listdir(out_a)) == sorted(os.listdir(out_b)) == \
            [p + ".json" for p in pids]
        for p in pids:
            a = json.load(open(os.path.join(out_a, p + ".json")))
            b = json.load(open(os.path.join(out_b, p + ".json")))
            assert a["roi_numbers"] == b["roi_numbers"]
            assert a["bin_id"] == b["bin_id"]
            np.testing.assert_allclose(a["output_scores"],
                                       b["output_scores"], atol=2e-5)

    def test_fewer_dispatches_than_per_bin(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import InferenceEngine, do_run
        root = tmp_path / "bins"
        self._mkbins(root, n=3, rois=5)  # 15 same-ladder ROIs, batch 8

        counts = []

        class CountingEngine(InferenceEngine):
            def __init__(self, *a, **kw):
                super().__init__(*a, **kw)
                inner = self._run_batch
                self.calls = 0
                def counted(*args):
                    self.calls += 1
                    return inner(*args)
                self._run_batch = counted

        for gobig in (False, True):
            eng = CountingEngine(ckpt, batch_size=8)
            do_run(run_args(str(root), ckpt,
                            str(tmp_path / f"out{gobig}"), gobig=gobig),
                   engine=eng)
            counts.append(eng.calls)
        assert counts[1] < counts[0]  # 2 shared batches vs 3 per-bin ones

    def test_corrupt_bin_isolated(self, ckpt, tmp_path, capsys):
        from ifcb_classifier_tpu.infer.runner import do_run
        root = tmp_path / "bins"
        pids = self._mkbins(root, n=2)
        bad = "D20240909T000000_IFCB900"
        write_bin(str(root), bad, [make_roi(20, 20, 5)], 2)
        roi = os.path.join(root, bad + ".roi")
        with open(roi, "r+b") as f:
            f.truncate(os.path.getsize(roi) // 4)  # byte ranges now OOB
        out = str(tmp_path / "out")
        do_run(run_args(str(root), ckpt, out, gobig=True))
        assert sorted(os.listdir(out)) == [p + ".json" for p in pids]
        printed = capsys.readouterr().out
        assert bad in printed and "corrupt bin" in printed

    def test_empty_and_v1_bins(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        root = tmp_path / "bins"
        # schema-v1 bin goes through the stitched fallback inside gobig
        write_bin(str(root), "IFCB1_2024_100_000000",
                  [make_roi(12, 12, 1), make_roi(9, 11, 2)], 1)
        out = str(tmp_path / "out")
        do_run(run_args(str(root), ckpt, out, gobig=True))
        assert os.listdir(out) == ["IFCB1_2024_100_000000.json"]


class TestWatchGobigCompose:
    def test_watch_with_gobig_aggregates_per_pass(self, ckpt, tmp_path,
                                                  monkeypatch):
        import time as real_time
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        write_bin(str(root), "D20241101T000000_IFCB900",
                  [make_roi(12, 14, 1), make_roi(10, 10, 2)], 2)

        class FakeTime:
            def __init__(self):
                self.sleeps = 0
            def time(self):
                return real_time.time() + 1e6
            def sleep(self, s):
                self.sleeps += 1
                if self.sleeps == 1:
                    write_bin(str(root), "D20241102T000000_IFCB900",
                              [make_roi(11, 11, 3)], 2)

        monkeypatch.setattr(runner, "time", FakeTime())
        out = str(tmp_path / "out")
        runner.do_run(run_args(str(root), ckpt, out, watch=0.01,
                               watch_passes=3, gobig=True))
        assert sorted(os.listdir(out)) == ["D20241101T000000_IFCB900.json",
                                           "D20241102T000000_IFCB900.json"]


class TestReviewHardening:
    """Fixes from the round-2 code review: per-bin containment of write
    failures under --gobig, watch staleness self-healing, failure backoff,
    upfront flag validation, no global matplotlib mutation."""

    def test_gobig_write_failure_contained_per_bin(self, ckpt, tmp_path,
                                                   monkeypatch, capsys):
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        pids = [f"D2024120{i}T000000_IFCB900" for i in (1, 2, 3)]
        for i, p in enumerate(pids):
            write_bin(str(root), p, [make_roi(12, 14, i)], 2)
        real_save = runner.save_run_results

        def failing_save(input_images, *a, **kw):
            if pids[1] in str(input_images[0]):
                raise OSError("disk full (simulated)")
            return real_save(input_images, *a, **kw)

        monkeypatch.setattr(runner, "save_run_results", failing_save)
        out = str(tmp_path / "out")
        runner.do_run(run_args(str(root), ckpt, out, gobig=True))
        assert sorted(os.listdir(out)) == [pids[0] + ".json",
                                           pids[2] + ".json"]
        printed = capsys.readouterr().out
        assert pids[1] in printed and "disk full" in printed

    def test_watch_reclassifies_grown_bin(self, ckpt, tmp_path, monkeypatch):
        """A bin classified prematurely (acquisition paused longer than the
        settle window) self-heals: when it grows, outputs are stale and the
        next pass reclassifies."""
        import json as _json
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        pid = "D20241211T000000_IFCB900"
        write_bin(str(root), pid, [make_roi(12, 14, 1)], 2)
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (1, 1))
        monkeypatch.setattr(runner.time, "sleep", lambda s: None)
        out = str(tmp_path / "out")
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=1))
        first = _json.load(open(os.path.join(out, pid + ".json")))
        assert len(first["roi_numbers"]) == 1
        # the bin grows (more ROIs arrive): bin files end up NEWER than the
        # output yet older than the settle window (acquisition resumed after
        # a pause, then finished)
        write_bin(str(root), pid, [make_roi(12, 14, 1), make_roi(10, 10, 2),
                                   make_roi(9, 9, 3)], 2)
        bin_t = time.time() - 4000   # quiescent (> 3600s settle)
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (bin_t, bin_t))
        out_t = time.time() - 7200   # output predates the bin's growth
        os.utime(os.path.join(out, pid + ".json"), (out_t, out_t))
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=1))
        second = _json.load(open(os.path.join(out, pid + ".json")))
        assert len(second["roi_numbers"]) == 3

    def test_watch_failed_bin_retried_with_backoff(self, ckpt, tmp_path,
                                                   monkeypatch, capsys):
        """A bin that fails transiently is retried after backoff, not frozen
        for the session."""
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        pid = "D20241212T000000_IFCB900"
        write_bin(str(root), pid, [make_roi(16, 16, 1)], 2)
        # corrupt: truncate .roi so the first attempts fail
        roi = os.path.join(root, pid + ".roi")
        good = open(roi, "rb").read()
        with open(roi, "wb") as f:
            f.write(good[:4])
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (1, 1))

        calls = {"n": 0}
        def sleep(s):
            calls["n"] += 1
            if calls["n"] == 2:  # heal the bin between passes 2 and 3
                with open(roi, "wb") as fh:
                    fh.write(good)
                old = 1
                for f in os.listdir(root):
                    os.utime(os.path.join(root, f), (old, old))
        monkeypatch.setattr(runner.time, "sleep", sleep)
        out = str(tmp_path / "out")
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=5))
        assert os.listdir(out) == [pid + ".json"]
        assert "FAILED" in capsys.readouterr().out  # surfaced immediately

    def test_watch_rejected_in_img_mode_and_nonpositive(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        src = write_image_folder_dataset(str(tmp_path / "imgs"), {"a": 2},
                                         size=(30, 30))
        with pytest.raises(ValueError, match="requires --type bin"):
            do_run(run_args(src, ckpt, str(tmp_path / "o1"), src_type="img",
                            outfile=["r.json"], watch=60.0))
        with pytest.raises(ValueError, match="positive"):
            do_run(run_args(src, ckpt, str(tmp_path / "o2"), watch=0.0))

    def test_plot_params_validated_before_compute(self, ckpt, tmp_path,
                                                  monkeypatch):
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        write_bin(str(root), "D20241213T000000_IFCB900",
                  [make_roi(10, 10, 1)], 2)
        called = {"n": 0}
        monkeypatch.setattr(
            runner.InferenceEngine, "predict_bin",
            lambda self, b: called.__setitem__("n", called["n"] + 1))
        with pytest.raises(ValueError, match="unknown plot param"):
            runner.do_run(run_args(str(root), ckpt, str(tmp_path / "out"),
                                   plot_files=[["x.png", "confusion"]]))
        assert called["n"] == 0  # failed before any inference

    def test_no_global_matplotlib_mutation(self, tmp_path):
        import matplotlib
        before_backend = matplotlib.get_backend()
        before_grid = matplotlib.rcParams["axes.grid"]
        from ifcb_classifier_tpu.results.plots import save_run_plots
        save_run_plots(str(tmp_path / "p.png"), [], class_labels=["a", "b"],
                       output_classes=[0, 1, 1], winscores=[.9, .5, .7])
        assert matplotlib.get_backend() == before_backend
        assert matplotlib.rcParams["axes.grid"] == before_grid


class TestRunSummary:
    """--summary: machine-readable JSON run summary (aggregate-plot twin)."""

    def test_bin_mode_summary(self, ckpt, bin_tree, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        out = str(tmp_path / "out")
        do_run(run_args(str(bin_tree), ckpt, out, summary="summary.json"))
        s = json.load(open(os.path.join(out, "summary.json")))
        assert s["n_bins_done"] == 3 and s["n_errors"] == 0
        assert s["n_rois"] == 6  # 3 bins x 2 ROIs
        assert set(s["class_counts"]) == {"a", "b"}
        assert sum(s["class_counts"].values()) == 6
        assert sum(s["score_histogram"]["counts"]) == 6
        assert s["model_id"] == "m" and s["version"] == "v3"

    def test_summary_records_errors(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        root = tmp_path / "bins"
        write_bin(str(root), "D20250301T000000_IFCB900",
                  [make_roi(10, 12, 1)], 2)
        bad = "D20250302T000000_IFCB900"
        write_bin(str(root), bad, [make_roi(20, 20, 2)], 2)
        roi = os.path.join(root, bad + ".roi")
        with open(roi, "r+b") as f:
            f.truncate(3)
        out = str(tmp_path / "out")
        do_run(run_args(str(root), ckpt, out, summary="s.json"))
        s = json.load(open(os.path.join(out, "s.json")))
        assert s["n_bins_done"] == 1 and s["n_errors"] == 1
        assert s["errors"][0]["bin"].startswith(bad)
        assert "corrupt" in s["errors"][0]["message"]

    def test_img_mode_summary(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        src = write_image_folder_dataset(str(tmp_path / "imgs"), {"a": 5},
                                         size=(30, 30))
        out = str(tmp_path / "out")
        do_run(run_args(src, ckpt, out, src_type="img",
                        outfile=["img_results.json"], summary="s.json"))
        s = json.load(open(os.path.join(out, "s.json")))
        assert s["n_rois"] == 5
        assert sum(s["class_counts"].values()) == 5
        # schema disambiguation (round-3): img-mode runs say so explicitly
        # instead of reusing n_bins_done=0 to mean two different things
        assert s["src_type"] == "img" and s["n_images"] == 5
        assert s["n_bins_done"] == 0

    def test_watch_refreshes_summary(self, ckpt, tmp_path, monkeypatch):
        import time as real_time
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        write_bin(str(root), "D20250303T000000_IFCB900",
                  [make_roi(12, 14, 1)], 2)

        class FakeTime:
            def __init__(self):
                self.sleeps = 0
            def time(self):
                return real_time.time() + 1e6
            def sleep(self, s):
                self.sleeps += 1
                if self.sleeps == 1:
                    write_bin(str(root), "D20250304T000000_IFCB900",
                              [make_roi(9, 9, 2), make_roi(8, 8, 3)], 2)

        monkeypatch.setattr(runner, "time", FakeTime())
        out = str(tmp_path / "out")
        runner.do_run(run_args(str(root), ckpt, out, watch=0.01,
                               watch_passes=3, summary="live.json"))
        s = json.load(open(os.path.join(out, "live.json")))
        assert s["n_bins_done"] == 2 and s["n_rois"] == 3

    def test_cli_flag(self):
        from ifcb_classifier_tpu.cli import argparse_nn
        a = argparse_nn().parse_args(["RUN", "s", "m.ptl", "r",
                                      "--summary", "sum.json"])
        assert a.summary == "sum.json"


class TestOversizedRois:
    """Images/ROIs larger than the 1024-px canvas ceiling are shrink-to-fit,
    never cropped (reference parity: neuston_data.py:456-464 resizes the
    full image; the code-review caught the silent crop)."""

    def test_pack_canvas_shrinks_not_crops(self):
        from ifcb_classifier_tpu.data.pipeline import (MAX_CANVAS,
                                                       pack_canvas_batch)
        img = np.zeros((200, 1400), np.uint8)
        img[:, -10:] = 255  # distinctive far-right stripe
        canvas, sizes, n = pack_canvas_batch([img], batch_size=2, rgb=False)
        h, w = sizes[0]
        assert w <= MAX_CANVAS and w > 900  # shrunk, aspect kept
        assert canvas[0, :h, w - 3:w].mean() > 200  # stripe survived

    def test_predict_bin_oversized_roi(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.data.ifcb import Bin
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        rois = [make_roi(16, 20, 1),
                np.asarray(make_roi(40, 1100, 2)),  # wider than the ceiling
                make_roi(10, 10, 3)]
        base = write_bin(str(tmp_path), "D20250501T000000_IFCB900", rois, 2)
        eng = InferenceEngine(ckpt, batch_size=8)
        targets, probs = eng.predict_bin(Bin(base + ".adc"))
        assert targets == [1, 2, 3]
        np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-4)
        # the oversized ROI's scores match the generic path on the same array
        direct = eng.predict_images([rois[1]])
        np.testing.assert_allclose(probs[1], direct[0], atol=1e-4)

    def test_gobig_oversized_and_all_oversized_bins(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        root = tmp_path / "bins"
        write_bin(str(root), "D20250502T000000_IFCB900",
                  [make_roi(12, 14, 1), make_roi(30, 1100, 2)], 2)
        write_bin(str(root), "D20250503T000000_IFCB900",
                  [make_roi(20, 1200, 3)], 2)  # ALL oversized
        out = str(tmp_path / "out")
        do_run(run_args(str(root), ckpt, out, gobig=True))
        a = json.load(open(os.path.join(
            out, "D20250502T000000_IFCB900.json")))
        b = json.load(open(os.path.join(
            out, "D20250503T000000_IFCB900.json")))
        assert a["roi_numbers"] == [1, 2] and b["roi_numbers"] == [1]


class TestManifestAndDiscoveryFixes:
    def test_shard_manifest_rejects_empty(self, monkeypatch):
        import jax
        from ifcb_classifier_tpu.parallel.distributed import shard_manifest
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        with pytest.raises(ValueError, match="EMPTY manifest"):
            shard_manifest([], [])

    def test_datadirectory_discovery_cached(self, tmp_path, monkeypatch):
        import ifcb_classifier_tpu.data.ifcb as ifcb_mod
        write_bin(str(tmp_path), "D20250504T000000_IFCB900",
                  [make_roi(8, 8, 0)], 2)
        dd = ifcb_mod.DataDirectory(str(tmp_path))
        walks = {"n": 0}
        real_walk = os.walk
        def counting(*a, **kw):
            walks["n"] += 1
            return real_walk(*a, **kw)
        monkeypatch.setattr(ifcb_mod.os, "walk", counting)
        assert len(dd) == 1
        assert len(list(dd)) == 1
        assert walks["n"] == 1  # second access served from the cache

    def test_balanced_sampler_excludes_manifest_pads(self, tmp_path):
        from fixtures import write_image_folder_dataset
        from ifcb_classifier_tpu.data.pipeline import HostLoader
        src = write_image_folder_dataset(str(tmp_path / "ds"),
                                         {"a": 6, "b": 2}, size=(20, 20))
        import glob as g
        paths = sorted(g.glob(src + "/*/*.png"))
        labels = [0] * 6 + [1] * 2
        # simulate shard_manifest pads: repeat the first item 4x past n_real
        items = paths + [paths[0]] * 4
        labs = labels + [0] * 4
        ld = HostLoader(items, labs, batch_size=4, shuffle=True, seed=3,
                        balanced=True, n_real=8)
        for b in ld:
            assert b["mask"].all()          # no wasted masked rows
            assert (b["indices"] < 8).all()  # pads never drawn

    def test_balanced_sampler_survives_all_pads_shard(self, tmp_path):
        """An ALL-pads shard (more replica groups than training images:
        shard_manifest borrowed every row, n_real=0) must iterate like the
        unbalanced path — rng.choice over zero items used to raise and
        crash the whole multi-host TRAIN on the smallest datasets."""
        from fixtures import write_image_folder_dataset
        from ifcb_classifier_tpu.data.pipeline import HostLoader
        src = write_image_folder_dataset(str(tmp_path / "ds"),
                                         {"a": 1}, size=(20, 20))
        import glob as g
        p = sorted(g.glob(src + "/*/*.png"))[0]
        ld = HostLoader([p, p], [0, 0], batch_size=2, shuffle=True,
                        seed=3, balanced=True, n_real=0)
        batches = list(ld)
        assert len(batches) == 1
        assert not batches[0]["mask"].any()  # every row masked out


class TestOrchestrationReviewFixes:
    """Third review batch: precision plumbing, filter validation, settle=0,
    rank-suffixed fleet outputs, degenerate-run guards."""

    def test_cli_precision_reaches_engine(self, ckpt, tmp_path, monkeypatch):
        import jax.numpy as jnp
        from ifcb_classifier_tpu import cli
        from ifcb_classifier_tpu.infer import runner
        seen = {}

        # subclass so the REAL from_args mapping runs (cls = Probe): the
        # test pins the one CLI-flag -> constructor-kwarg translation both
        # entry points share
        class Probe(runner.InferenceEngine):
            def __init__(self, path, batch_size=108, dtype=None, mesh=None,
                         quant=False, **kw):
                seen["dtype"] = dtype
                seen["mesh"] = mesh
                seen["quant"] = quant
                seen["kw"] = kw
                raise RuntimeError("probe stop")

        monkeypatch.setattr(runner, "InferenceEngine", Probe)
        with pytest.raises(RuntimeError, match="probe stop"):
            cli.main_cli(["--precision", "bf16", "RUN", "src", ckpt, "rid"])
        assert seen["dtype"] == jnp.bfloat16
        assert seen["mesh"] == "auto"  # --mesh default reaches the engine
        # ladder defaults to None (engine decides: on unless env opts out)
        assert seen["kw"]["batch_ladder"] is None
        with pytest.raises(RuntimeError, match="probe stop"):
            cli.main_cli(["--precision", "fp32", "--mesh", "8x1",
                          "RUN", "src", ckpt, "rid", "--no-batch-ladder"])
        assert seen["dtype"] == jnp.float32
        assert seen["mesh"] == "8x1"
        # --no-batch-ladder must reach the engine from the REAL CLI path
        # (it was silently dropped when main_cli carried its own copy of
        # the constructor call)
        assert seen["kw"]["batch_ladder"] is False
        # int8 maps to quant=True with the auto compute dtype for the
        # surrounding elementwise graph
        with pytest.raises(RuntimeError, match="probe stop"):
            cli.main_cli(["--precision", "int8", "RUN", "src", ckpt, "rid"])
        assert seen["quant"] is True
        assert seen["dtype"] == jnp.float32  # auto on CPU test backend

    def test_filter_mode_validated(self, ckpt, bin_tree, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        with pytest.raises(ValueError, match='"IN" or "OUT"'):
            do_run(run_args(str(bin_tree), ckpt, str(tmp_path / "o"),
                            filter=["in", "D2024"]))

    def test_watch_settle_zero_honored(self, ckpt, tmp_path, monkeypatch):
        """--watch-settle 0 must mean NO settle delay, not 'unset'."""
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        write_bin(str(root), "D20250701T000000_IFCB900",
                  [make_roi(10, 12, 1)], 2)  # mtime = now
        monkeypatch.setattr(runner.time, "sleep", lambda s: None)
        out = str(tmp_path / "out")
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_settle=0.0, watch_passes=1))
        assert os.listdir(out) == ["D20250701T000000_IFCB900.json"]

    def test_fleet_summary_rank_suffixed(self, ckpt, tmp_path, monkeypatch):
        import jax
        from ifcb_classifier_tpu.infer.runner import do_run
        root = tmp_path / "bins"
        for i in (1, 2):
            write_bin(str(root), f"D2025070{i + 1}T000000_IFCB900",
                      [make_roi(10, 12, i)], 2)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        out = str(tmp_path / "out")
        do_run(run_args(str(root), ckpt, out, summary="s.json"))
        files = os.listdir(out)
        assert "s.r1.json" in files and "s.json" not in files

    def test_train_emax0_and_profile_flush(self, tmp_path):
        from test_train_loop import make_args
        from ifcb_classifier_tpu.train.loop import do_training
        os.environ["IFCBNN_RESIZE_OVERRIDE"] = "32"
        try:
            src = write_image_folder_dataset(str(tmp_path / "ds"),
                                             {"a": 12, "b": 12},
                                             size=(20, 20))
            # emax=0: zero epochs must end cleanly, no artifact crashes
            do_training(make_args(src, str(tmp_path / "o1"), emax=0, emin=0,
                                  onnx=True))
            # --profile larger than total steps (trace starts at step 3 of
            # ~5): the end-of-run flush must close and write it
            do_training(make_args(src, str(tmp_path / "o2"), emax=1, emin=0,
                                  batch_size=4, profile=500))
            prof = os.path.join(tmp_path, "o2", "profile")
            assert os.path.isdir(prof)
        finally:
            os.environ.pop("IFCBNN_RESIZE_OVERRIDE", None)


class TestFilterValidation:
    """parse_filter hardening (QUIRKS.md FIXED row): the reference's
    keyword checks were dead code and blank keyword-file lines produced the
    match-everything keyword ''."""

    def test_filter_in_without_keywords_rejected(self):
        from ifcb_classifier_tpu.infer.runner import parse_filter
        with pytest.raises(ValueError, match="KEYWORD"):
            parse_filter(["IN"])

    def test_keyword_file_blank_lines_dropped(self, tmp_path):
        from ifcb_classifier_tpu.infer.runner import parse_filter
        kf = tmp_path / "kw.txt"
        kf.write_text("D2024\n\n  IFCB900  \n\n")
        assert parse_filter(["OUT", str(kf)]) == ("OUT",
                                                  ["D2024", "IFCB900"])

    def test_all_blank_keyword_file_rejected(self, tmp_path):
        from ifcb_classifier_tpu.infer.runner import parse_filter
        kf = tmp_path / "kw.txt"
        kf.write_text("\n\n")
        with pytest.raises(ValueError, match="KEYWORD"):
            parse_filter(["IN", str(kf)])


class TestSilentFlagRejection:
    """Flags whose enabling flag is absent must be rejected loudly, not
    silently ignored (same policy as the --watch spelling checks)."""

    def test_watch_settle_without_watch(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        src = str(tmp_path / "bins")
        os.makedirs(src)
        with pytest.raises(ValueError, match="watch-settle"):
            do_run(run_args(src, ckpt, str(tmp_path / "o"),
                            watch_settle=60.0))

    def test_calib_batches_without_int8(self, ckpt, tmp_path):
        from ifcb_classifier_tpu.infer.runner import do_run
        src = str(tmp_path / "bins")
        os.makedirs(src)
        with pytest.raises(ValueError, match="calib-batches"):
            do_run(run_args(src, ckpt, str(tmp_path / "o"),
                            calib_batches=4))


class TestGobigPoisonedBatch:
    """A device fetch failing for ONE in-flight gobig batch must error-
    record exactly the bins riding that batch; the aggregator stays usable
    and flush's completeness assert holds (per-bin error isolation)."""

    def test_poisoned_batch_errors_its_bins_only(self, ckpt, tmp_path,
                                                 monkeypatch):
        import jax as _jax
        from ifcb_classifier_tpu.data.ifcb import Bin
        from ifcb_classifier_tpu.infer import runner
        from ifcb_classifier_tpu.infer.runner import InferenceEngine

        engine = InferenceEngine(ckpt, batch_size=8)
        root = tmp_path / "bins"
        pids = [f"D2025060{i}T000000_IFCB900" for i in (1, 2, 3)]
        bins = []
        for i, p in enumerate(pids):
            write_bin(str(root), p, [make_roi(12, 14, i)], 2)
            bins.append(Bin(str(root / (p + ".adc"))))

        results, errors = {}, {}
        agg = engine.gobig(
            lambda obj, t, pr: results.__setitem__(str(obj), pr),
            lambda obj, e: errors.__setitem__(str(obj), e))

        # tag the FIRST dispatched batch; fail exactly its device fetch
        real_dispatch = engine._dispatch
        poison = []

        def tag_dispatch(canvas, sizes):
            out = real_dispatch(canvas, sizes)
            if not poison:
                poison.append(out)
            return out

        real_get = _jax.device_get

        def poison_get(x):
            if poison and x is poison[0]:
                raise RuntimeError("simulated fetch failure")
            return real_get(x)

        monkeypatch.setattr(engine, "_dispatch", tag_dispatch)
        monkeypatch.setattr(runner.jax, "device_get", poison_get)

        agg.add_bin(bins[0], bins[0].pid)
        agg.add_bin(bins[1], bins[1].pid)
        agg.flush()  # both bins rode the poisoned batch
        assert set(errors) == {pids[0], pids[1]} and not results
        assert "simulated fetch failure" in str(errors[pids[0]])

        # the same aggregator keeps working after the incident
        agg.add_bin(bins[2], bins[2].pid)
        agg.flush()
        assert set(results) == {pids[2]}


class TestGobigSyncDispatchFailure:
    def test_sync_dispatch_failure_errors_its_bins_only(self, ckpt, tmp_path,
                                                        monkeypatch):
        """A SYNCHRONOUS dispatch failure (compile/OOM on a new bucket
        shape) must error-record the bins in that batch — not whichever
        unrelated bin triggered the batch fill — and leave the aggregator
        usable with no poisoned queue head."""
        from ifcb_classifier_tpu.data.ifcb import Bin
        from ifcb_classifier_tpu.infer.runner import InferenceEngine

        engine = InferenceEngine(ckpt, batch_size=8)
        root = tmp_path / "bins"
        pids = [f"D2025062{i}T000000_IFCB900" for i in (1, 2, 3)]
        bins = []
        for i, p in enumerate(pids):
            write_bin(str(root), p, [make_roi(12, 14, i)], 2)
            bins.append(Bin(str(root / (p + ".adc"))))

        results, errors = {}, {}
        agg = engine.gobig(
            lambda obj, t, pr: results.__setitem__(str(obj), pr),
            lambda obj, e: errors.__setitem__(str(obj), e))

        real_dispatch = engine._dispatch
        calls = []

        def failing_dispatch(canvas, sizes):
            calls.append(1)
            if len(calls) == 1:
                raise RuntimeError("simulated compile failure")
            return real_dispatch(canvas, sizes)

        monkeypatch.setattr(engine, "_dispatch", failing_dispatch)
        agg.add_bin(bins[0], bins[0].pid)
        agg.add_bin(bins[1], bins[1].pid)
        agg.flush()  # one batch, dispatch raises synchronously
        assert set(errors) == {pids[0], pids[1]} and not results
        assert "compile failure" in str(errors[pids[0]])

        agg.add_bin(bins[2], bins[2].pid)  # aggregator still usable
        agg.flush()
        assert set(results) == {pids[2]}


class TestTxtListRobustness:
    def test_entries_with_adc_extension_match(self, ckpt, bin_tree,
                                              tmp_path):
        """.txt entries may be .adc paths (the single-bin SRC branch
        accepts those too); pids compare extension-stripped."""
        from ifcb_classifier_tpu.infer.runner import do_run
        lst = tmp_path / "bins.txt"
        lst.write_text(str(bin_tree / "x" / "D20240101T000000_IFCB900.adc")
                       + "\n")
        out = str(tmp_path / "out")
        do_run(run_args(str(lst), ckpt, out))
        assert sorted(os.listdir(out)) == ["D20240101T000000_IFCB900.json"]

    def test_list_matching_nothing_is_loud(self, ckpt, bin_tree, tmp_path):
        """A list whose entries match no bins must raise, not print
        'RUN IS DONE (0 bins)' — a silent data gap."""
        from ifcb_classifier_tpu.infer.runner import do_run
        lst = tmp_path / "bins.txt"
        lst.write_text(str(bin_tree / "x" / "D20990101T000000_IFCB900")
                       + "\n")
        with pytest.raises(ValueError, match="could not be resolved"):
            do_run(run_args(str(lst), ckpt, str(tmp_path / "out")))


class TestEngineEdgeCases:
    def test_predict_images_empty_list(self, ckpt):
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        engine = InferenceEngine(ckpt, batch_size=8)
        out = engine.predict_images([])
        assert out.shape == (0, 2)

    def test_overflowing_adc_dims_fail_loudly_both_paths(self, ckpt,
                                                         tmp_path):
        """startByte/dims whose product wraps int64 must fail the BIN (both
        predict_bin and gobig add_bin), never pass the bounds check into
        the packer (roipack.cpp parity)."""
        from ifcb_classifier_tpu.data.ifcb import ADC_COLUMNS_V2, Bin
        from ifcb_classifier_tpu.infer.runner import InferenceEngine

        base = write_bin(str(tmp_path), "D20250801T000000_IFCB900",
                         [make_roi(10, 10, 2)], 2)
        lines = open(base + ".adc").read().rstrip("\n").split("\n")
        cells = lines[0].split(",")
        cells[ADC_COLUMNS_V2.index("startByte")] = str(2 ** 62)
        cells[ADC_COLUMNS_V2.index("roiWidth")] = str(2 ** 31)
        cells[ADC_COLUMNS_V2.index("roiHeight")] = str(2 ** 31)
        open(base + ".adc", "w").write(",".join(cells) + "\n")

        engine = InferenceEngine(ckpt, batch_size=8)
        b = Bin(base + ".adc")
        with pytest.raises(ValueError, match="out of bounds"):
            engine.predict_bin(b)
        errors = {}
        agg = engine.gobig(lambda *a: None,
                           lambda obj, e: errors.__setitem__(str(obj), e))
        agg.add_bin(b, b.pid)
        agg.flush()
        assert errors and "out of bounds" in str(list(errors.values())[0])


class TestWatchStatRaces:
    def test_vanishing_bin_file_does_not_kill_the_service(self, ckpt,
                                                          tmp_path,
                                                          monkeypatch,
                                                          capsys):
        """A file deleted between isfile() and getmtime() (instrument
        rotation, NFS hiccup) is a per-bin incident with backoff — the
        watch service must keep running and classify the bin later."""
        import time as real_time
        from ifcb_classifier_tpu.infer import runner

        root = tmp_path / "bins"
        pid = "D20250810T000000_IFCB900"
        write_bin(str(root), pid, [make_roi(12, 14, 1)], 2)
        out = str(tmp_path / "out")

        real_getmtime = os.path.getmtime
        fails = []

        def flaky_getmtime(p):
            if not fails and str(p).endswith(".roi"):
                fails.append(1)
                raise OSError("vanished (simulated)")
            return real_getmtime(p)

        monkeypatch.setattr(runner.os.path, "getmtime", flaky_getmtime)

        class FakeTime:
            def time(self):
                return real_time.time() + 1e6

            def sleep(self, s):
                pass

        monkeypatch.setattr(runner, "time", FakeTime())
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=4))
        assert os.path.isfile(os.path.join(out, pid + ".json"))
        assert "vanished" in capsys.readouterr().out


class TestWatchBackoffReset:
    def test_success_resets_failure_backoff(self, ckpt, tmp_path,
                                            monkeypatch, capsys):
        """fail → succeed → (bin grows) fail again: the second incident
        starts at backoff 2, not the cumulative 4 — success closes the
        incident (review fix)."""
        import re
        import time as real_time
        from ifcb_classifier_tpu.infer import runner

        root = tmp_path / "bins"
        pid = "D20250701T000000_IFCB900"
        write_bin(str(root), pid, [make_roi(12, 14, 1)], 2)
        out = str(tmp_path / "out")

        engine = runner.InferenceEngine(ckpt, batch_size=8)
        real_predict = engine.predict_bin
        calls = []

        def flaky_predict(bin_):
            calls.append(1)
            if len(calls) in (1, 3):  # two separate one-off incidents
                raise OSError("transient")
            return real_predict(bin_)

        monkeypatch.setattr(engine, "predict_bin", flaky_predict)

        class FakeTime:
            def __init__(self):
                self.sleeps = 0

            def time(self):
                return real_time.time() + 1e6

            def sleep(self, s):
                self.sleeps += 1
                if self.sleeps == 3 and os.path.isfile(
                        os.path.join(out, pid + ".json")):
                    # bin grows after its successful classification;
                    # backdate the output so the self-heal reclassifies
                    write_bin(str(root), pid,
                              [make_roi(12, 14, 1), make_roi(9, 9, 2)], 2)
                    old = real_time.time() - 100
                    os.utime(os.path.join(out, pid + ".json"), (old, old))

        monkeypatch.setattr(runner, "time", FakeTime())
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=7), engine=engine)
        retries = re.findall(r"retry in (\d+) pass", capsys.readouterr().out)
        # both incidents back off 2 passes; without the reset the second
        # would report 4
        assert retries == ["2", "2"]


class TestWatchSteadyState:
    """Serving soak: a STATIC directory under many watch passes must be
    fully idempotent — outputs byte-stable (no rework/rewrite), summary
    flat, and the Python heap flat across idle passes (a leak in any
    per-pass accumulator compounds over a months-long deployment)."""

    def test_many_passes_idempotent_and_heap_flat(self, ckpt, tmp_path,
                                                  monkeypatch):
        import tracemalloc
        import time as real_time
        from ifcb_classifier_tpu.infer import runner

        root = tmp_path / "bins"
        for i in range(3):
            write_bin(str(root), f"D2025050{i + 1}T000000_IFCB900",
                      [make_roi(16, 20, i), make_roi(10, 10, i + 3)], 2)
        out = str(tmp_path / "out")

        snaps = []

        class FakeTime:
            def __init__(self):
                self.sleeps = 0

            def time(self):  # far future: every bin quiescent immediately
                return real_time.time() + 1e6

            def sleep(self, s):  # fires between passes — snapshot here
                self.sleeps += 1
                files = {}
                for dp, _, fns in os.walk(out):
                    for fn in fns:
                        if fn == "live.json":  # summary refreshes per pass
                            continue
                        p = os.path.join(dp, fn)
                        st = os.stat(p)
                        files[os.path.relpath(p, out)] = (st.st_mtime_ns,
                                                          st.st_size)
                snaps.append((files, tracemalloc.get_traced_memory()[0]))

        monkeypatch.setattr(runner, "time", FakeTime())
        tracemalloc.start()
        try:
            runner.do_run(run_args(str(root), ckpt, out, watch=0.01,
                                   watch_passes=12, summary="live.json"))
        finally:
            tracemalloc.stop()

        assert len(snaps) == 11  # 12 passes, one sleep between each
        baseline = snaps[0][0]
        # one output per bin after pass 1, plus the aggregate-resume
        # sidecar — written once when contributions change on pass 1 and
        # (held byte-stable below) NEVER rewritten across idle passes
        assert len(baseline) == 4
        assert ".watch_state.json" in baseline
        for files, _ in snaps[1:]:  # never rewritten, never re-dated
            assert files == baseline
        # heap flat across the idle passes (pass 2 → pass 12, after the
        # first idle pass has warmed any lazy caches); generous bound
        heap_warm, heap_end = snaps[1][1], snaps[-1][1]
        assert heap_end - heap_warm < 512 * 1024, (heap_warm, heap_end)
        s = json.load(open(os.path.join(out, "live.json")))
        assert s["n_bins_done"] == 3

    def test_deleted_bin_bookkeeping_evicted(self, ckpt, tmp_path,
                                             monkeypatch):
        """Bookkeeping for bins DELETED from the watched directory is
        dropped after 3 consecutive scans without them (VERDICT r3 weak
        #4): map sizes track the directory, not service history — the
        aggregate summary follows the live directory (the contribution is
        subtracted on eviction), and a pid re-added later is classified
        again as new (done_pids no longer pins it)."""
        import time as real_time
        from ifcb_classifier_tpu.infer import runner

        root = tmp_path / "bins"
        pids = [f"D2025060{i + 1}T000000_IFCB900" for i in range(3)]
        for i, p in enumerate(pids):
            write_bin(str(root), p,
                      [make_roi(16, 20, i), make_roi(10, 10, i + 3)], 2)
        out = str(tmp_path / "out")
        summaries = []

        class FakeTime:
            def __init__(self):
                self.sleeps = 0

            def time(self):  # far future: every bin quiescent immediately
                return real_time.time() + 1e6

            def sleep(self, s):
                self.sleeps += 1
                summaries.append(json.load(
                    open(os.path.join(out, "live.json"))))
                if self.sleeps == 1:  # delete bin 3: files AND its output
                    for f in os.listdir(root):
                        if f.startswith(pids[2]):
                            os.remove(os.path.join(root, f))
                    os.remove(os.path.join(out, pids[2] + ".json"))
                if self.sleeps == 6:  # re-add it well after eviction
                    write_bin(str(root), pids[2],
                              [make_roi(16, 20, 2), make_roi(10, 10, 5)], 2)

        monkeypatch.setattr(runner, "time", FakeTime())
        runner.do_run(run_args(str(root), ckpt, out, watch=0.01,
                               watch_passes=8, summary="live.json"))
        assert summaries[0]["n_rois"] == 6       # pass 1: all classified
        assert summaries[1]["n_rois"] == 6       # pass 2: absent x1 — kept
        assert summaries[2]["n_rois"] == 6       # pass 3: absent x2 — kept
        assert summaries[3]["n_rois"] == 4       # pass 4: absent x3 — evicted
        final = json.load(open(os.path.join(out, "live.json")))
        assert final["n_rois"] == 6              # re-added and reclassified
        # eviction decrements n_done (round-5 review): a deleted+re-added
        # bin counts ONCE in the live metric — it used to inflate to 4
        # and snap back down on the next restart's sidecar reload
        assert final["n_bins_done"] == 3
        assert os.path.isfile(os.path.join(out, pids[2] + ".json"))


    def test_readded_bin_with_intact_outputs_rejoins_aggregate(
            self, ckpt, tmp_path, monkeypatch):
        """A bin evicted while absent whose OUTPUT files survived on disk
        (rotation replay, operator mv out and back preserving mtimes) must
        be reclassified on reappearance: its outputs are fresher than the
        re-added bin files, so the plain skip-if-output-exists branch would
        pin it skipped forever while its ROIs stayed permanently subtracted
        from the live aggregate (round-4 review)."""
        import time as real_time
        from ifcb_classifier_tpu.infer import runner

        root = tmp_path / "bins"
        pids = [f"D2025070{i + 1}T000000_IFCB900" for i in range(2)]
        for i, p in enumerate(pids):
            write_bin(str(root), p,
                      [make_roi(16, 20, i), make_roi(10, 10, i + 3)], 2)
        out = str(tmp_path / "out")
        summaries = []

        class FakeTime:
            def __init__(self):
                self.sleeps = 0

            def time(self):  # far future: every bin quiescent immediately
                return real_time.time() + 1e6

            def sleep(self, s):
                self.sleeps += 1
                summaries.append(json.load(
                    open(os.path.join(out, "live.json"))))
                if self.sleeps == 1:  # remove bin 2's FILES, keep its output
                    for f in os.listdir(root):
                        if f.startswith(pids[1]):
                            os.remove(os.path.join(root, f))
                if self.sleeps == 6:  # re-add with mtimes OLDER than the
                    # pass-1 outputs, so the staleness self-heal does NOT
                    # fire and only the no-live-contribution rule can
                    # trigger the reclassification under test
                    write_bin(str(root), pids[1],
                              [make_roi(16, 20, 1), make_roi(10, 10, 4)], 2)
                    old = real_time.time() - 5000
                    for f in os.listdir(root):
                        if f.startswith(pids[1]):
                            os.utime(os.path.join(root, f), (old, old))

        monkeypatch.setattr(runner, "time", FakeTime())
        runner.do_run(run_args(str(root), ckpt, out, watch=0.01,
                               watch_passes=8, summary="live.json"))
        assert summaries[0]["n_rois"] == 4       # pass 1: both classified
        assert summaries[3]["n_rois"] == 2       # absent x3 — evicted
        final = json.load(open(os.path.join(out, "live.json")))
        assert final["n_rois"] == 4              # reclassified on return
        # live metric tracks the live directory (eviction decrements)
        assert final["n_bins_done"] == 2


class TestRound3Hardening:
    """Round-3 fixes: watch-mode aggregate double-count on staleness
    self-heal, predict_bin negative-startByte bounds check (gobig parity)."""

    def test_watch_reclassify_not_double_counted(self, ckpt, tmp_path,
                                                 monkeypatch):
        """Within ONE --watch service, a bin reclassified by the staleness
        self-heal must REPLACE its aggregate contribution, not add to it:
        summary counts stay per-ROI-exact over the service lifetime."""
        import time as real_time
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        pid = "D20250310T000000_IFCB900"
        write_bin(str(root), pid, [make_roi(12, 14, 1), make_roi(9, 9, 2)], 2)
        out = str(tmp_path / "out")

        class FakeTime:
            def __init__(self):
                self.sleeps = 0
            def time(self):
                # far future: every bin passes the settle gate immediately
                return real_time.time() + 1e6
            def sleep(self, s):
                self.sleeps += 1
                if self.sleeps == 1:
                    # the bin grows after classification; backdate the
                    # output so it is strictly older than the regrown bin
                    write_bin(str(root), pid,
                              [make_roi(12, 14, 1), make_roi(9, 9, 2),
                               make_roi(8, 8, 3)], 2)
                    old = real_time.time() - 100
                    os.utime(os.path.join(out, pid + ".json"), (old, old))

        monkeypatch.setattr(runner, "time", FakeTime())
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=2, summary="live.json"))
        s = json.load(open(os.path.join(out, "live.json")))
        reclassified = json.load(open(os.path.join(out, pid + ".json")))
        assert len(reclassified["roi_numbers"]) == 3  # self-heal happened
        assert s["n_bins_done"] == 1      # not 2: same bin, counted once
        assert s["n_rois"] == 3           # not 5: replaced, not added
        assert sum(s["class_counts"].values()) == 3
        assert sum(s["score_histogram"]["counts"]) == 3

    def test_predict_bin_negative_startbyte_fails_loudly(self, ckpt,
                                                         tmp_path):
        """A negative startByte wraps via Python negative indexing and can
        silently classify the wrong bytes; predict_bin must reject the whole
        bin up front exactly like the gobig path does."""
        from ifcb_classifier_tpu.data.ifcb import ADC_COLUMNS_V2, Bin
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        pid = "D20250311T000000_IFCB900"
        base = write_bin(str(tmp_path), pid,
                         [make_roi(16, 16, 1), make_roi(16, 16, 2)], 2)
        col = ADC_COLUMNS_V2.index("startByte")
        lines = open(base + ".adc").read().splitlines()
        parts = lines[1].split(",")
        parts[col] = "-256"  # wraps to a valid-length slice from the end
        lines[1] = ",".join(parts)
        with open(base + ".adc", "w") as f:
            f.write("\n".join(lines) + "\n")
        eng = InferenceEngine(ckpt, batch_size=8)
        with pytest.raises(ValueError, match="out of bounds"):
            eng.predict_bin(Bin(base + ".adc"))

    def test_engine_honors_pretrained_transform_input(self, tmp_path):
        """torchvision's inception_v3(pretrained=True) forces
        transform_input=True — a model attribute that applies at inference.
        The engine must rebuild with the checkpoint's pretrained flag, not
        hardcode pretrained=False (which silently dropped the channel
        renorm for pretrained inceptions before round 3)."""
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.infer.runner import InferenceEngine
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        from ifcb_classifier_tpu.train.state import create_train_state

        model = get_namebrand_model("inception_v3", 2, pretrained=True,
                                    dtype=jnp.float32)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), 299)
        for pretrained, expect in [(True, True), (False, False)]:
            ck = str(tmp_path / f"m{pretrained}.ptl")
            save_checkpoint(ck, state.params, state.batch_stats,
                            dict(MODEL="inception_v3", classes=["a", "b"],
                                 resize=299, model_id="m", seed=1,
                                 img_norm=None, pretrained=pretrained))
            eng = InferenceEngine(ck, batch_size=8)
            assert eng.model.transform_input is expect


class TestWatchRestartResume:
    """Service restart with a tracked aggregate (--summary/--plot) resumes
    per-bin contributions from the .watch_state.json sidecar instead of
    reclassifying every fresh-output bin in the archive (the round-4 review
    found restart cost scaled with the whole archive, not with new work)."""

    def _quiesce(self, root):
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (1, 1))

    def test_restart_skips_classified_bins_and_keeps_aggregate(
            self, ckpt, tmp_path, monkeypatch):
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        write_bin(str(root), "D20260101T000000_IFCB900",
                  [make_roi(12, 14, 1), make_roi(9, 9, 2)], 2)
        write_bin(str(root), "D20260102T000000_IFCB900",
                  [make_roi(16, 16, 3)], 2)
        self._quiesce(root)
        monkeypatch.setattr(runner.time, "sleep", lambda s: None)
        out = str(tmp_path / "out")
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=1, summary="live.json"))
        st = json.load(open(os.path.join(out, ".watch_state.json")))
        assert st["model_id"] == "m" and len(st["contrib"]) == 2
        s1 = json.load(open(os.path.join(out, "live.json")))
        assert s1["n_bins_done"] == 2 and s1["n_rois"] == 3

        # restart: outputs are fresh, sidecar present -> ZERO inference
        calls = {"n": 0}
        real = runner.InferenceEngine.predict_bin
        monkeypatch.setattr(
            runner.InferenceEngine, "predict_bin",
            lambda self, b: (calls.__setitem__("n", calls["n"] + 1),
                             real(self, b))[1])
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=1, summary="live.json"))
        assert calls["n"] == 0
        s2 = json.load(open(os.path.join(out, "live.json")))
        assert s2["n_bins_done"] == 2 and s2["n_rois"] == 3
        assert s2["class_counts"] == s1["class_counts"]
        assert s2["score_histogram"] == s1["score_histogram"]

    def test_corrupt_or_missing_sidecar_falls_back_to_reclassify(
            self, ckpt, tmp_path, monkeypatch):
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        write_bin(str(root), "D20260103T000000_IFCB900",
                  [make_roi(10, 10, 1)], 2)
        self._quiesce(root)
        monkeypatch.setattr(runner.time, "sleep", lambda s: None)
        out = str(tmp_path / "out")
        args = lambda: run_args(str(root), ckpt, out, watch=3600.0,
                                watch_passes=1, summary="live.json")
        runner.do_run(args())
        sidecar = os.path.join(out, ".watch_state.json")
        with open(sidecar, "w") as f:
            f.write("{ not json")
        runner.do_run(args())  # must not crash; reclassifies instead
        s = json.load(open(os.path.join(out, "live.json")))
        assert s["n_bins_done"] == 1 and s["n_rois"] == 1  # not doubled
        st = json.load(open(sidecar))  # rewritten valid after the pass
        assert len(st["contrib"]) == 1

    def test_model_change_invalidates_sidecar(self, ckpt, tmp_path,
                                              monkeypatch):
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        write_bin(str(root), "D20260104T000000_IFCB900",
                  [make_roi(11, 13, 1)], 2)
        self._quiesce(root)
        monkeypatch.setattr(runner.time, "sleep", lambda s: None)
        out = str(tmp_path / "out")
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=1, summary="live.json"))
        sidecar = os.path.join(out, ".watch_state.json")
        st = json.load(open(sidecar))
        st["model_id"] = "some-other-model"
        with open(sidecar, "w") as f:
            json.dump(st, f)
        calls = {"n": 0}
        real = runner.InferenceEngine.predict_bin
        monkeypatch.setattr(
            runner.InferenceEngine, "predict_bin",
            lambda self, b: (calls.__setitem__("n", calls["n"] + 1),
                             real(self, b))[1])
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=1, summary="live.json"))
        assert calls["n"] == 1  # stale sidecar ignored: rebuilt by re-run
        s = json.load(open(os.path.join(out, "live.json")))
        assert s["n_rois"] == 1

    def test_evicted_sidecar_bin_subtracted(self, ckpt, tmp_path,
                                            monkeypatch):
        """A sidecar contribution for a bin deleted from disk is evicted
        after EVICT_AFTER passes, keeping live-directory semantics."""
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        keep = "D20260105T000000_IFCB900"
        gone = "D20260106T000000_IFCB900"
        write_bin(str(root), keep, [make_roi(10, 10, 1)], 2)
        write_bin(str(root), gone, [make_roi(12, 12, 2),
                                    make_roi(8, 8, 3)], 2)
        self._quiesce(root)
        monkeypatch.setattr(runner.time, "sleep", lambda s: None)
        out = str(tmp_path / "out")
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=1, summary="live.json"))
        for f in list(os.listdir(root)):
            if f.startswith(gone):
                os.remove(os.path.join(root, f))
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=4, summary="live.json"))
        s = json.load(open(os.path.join(out, "live.json")))
        assert s["n_rois"] == 1  # the deleted bin's 2 ROIs subtracted
        st = json.load(open(os.path.join(out, ".watch_state.json")))
        assert list(st["contrib"]) == [keep]


class TestRound4ReviewFindings:
    """Regression tests for the second round-4 review pass."""

    def test_watch_survives_src_mount_flap(self, ckpt, tmp_path,
                                           monkeypatch, capsys):
        """A transient disappearance of the watched SRC directory (NFS
        flap) must neither kill the service nor advance eviction toward
        dropping every bin's aggregate contribution."""
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        hidden = tmp_path / "hidden"
        pid = "D20260201T000000_IFCB900"
        write_bin(str(root), pid, [make_roi(10, 10, 1), make_roi(8, 8, 2)], 2)
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (1, 1))

        flaps = {"n": 0}
        def sleep(s):  # SRC vanishes for passes 2-5 (> EVICT_AFTER=3)
            flaps["n"] += 1
            if flaps["n"] == 1:
                os.rename(root, hidden)
            elif flaps["n"] == 5:
                os.rename(hidden, root)
        monkeypatch.setattr(runner.time, "sleep", sleep)
        out = str(tmp_path / "out")
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=7, summary="live.json"))
        assert "skipping pass" in capsys.readouterr().out
        s = json.load(open(os.path.join(out, "live.json")))
        # contribution survived the flap: no eviction, no reclassification
        assert s["n_bins_done"] == 1 and s["n_rois"] == 2
        st = json.load(open(os.path.join(out, ".watch_state.json")))
        assert list(st["contrib"]) == [pid]

    def test_namespace_with_repeated_src_segment(self, ckpt, tmp_path):
        """{INPUT_SUBDIRS} must come from a PREFIX-anchored strip of SRC:
        the reference's replace() removes every occurrence, collapsing the
        namespace when a subdirectory path repeats the SRC string
        (QUIRKS.md FIXED row; neuston_net.py:234)."""
        from ifcb_classifier_tpu.infer.runner import do_run
        src = tmp_path / "data"
        # a bin whose subtree CONTAINS the SRC path string again
        inner = str(src) + str(src)  # e.g. /tmp/x/data/tmp/x/data
        pid = "D20260202T000000_IFCB900"
        write_bin(inner, pid, [make_roi(12, 12, 1)], 2)
        out = str(tmp_path / "out")
        do_run(run_args(str(src), ckpt, out,
                        outfile=["{INPUT_SUBDIRS}/{BIN_ID}.json"]))
        expect = os.path.join(out, str(src).lstrip(os.sep), pid + ".json")
        assert os.path.isfile(expect), (
            expect, [os.path.join(dp, f) for dp, _, fs in os.walk(out)
                     for f in fs])

    def test_profile_starts_on_restarted_watch_with_sidecar(
            self, ckpt, tmp_path, monkeypatch):
        """--profile N on a restarted --watch service: the start gate must
        key on bins classified THIS session — the sidecar resume sets
        n_done > 0 before any bin is classified, which used to pin the
        profiler off forever."""
        from ifcb_classifier_tpu.infer import runner
        root = tmp_path / "bins"
        write_bin(str(root), "D20260203T000000_IFCB900",
                  [make_roi(10, 10, 1)], 2)
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (1, 1))
        monkeypatch.setattr(runner.time, "sleep", lambda s: None)
        out = str(tmp_path / "out")
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=1, summary="live.json"))
        # restart with one NEW bin arriving and --profile 1
        write_bin(str(root), "D20260204T000000_IFCB900",
                  [make_roi(9, 9, 2)], 2)
        for f in os.listdir(root):
            os.utime(os.path.join(root, f), (1, 1))
        calls = {"start": 0, "stop": 0}
        monkeypatch.setattr(
            runner.jax.profiler, "start_trace",
            lambda *a, **k: calls.__setitem__("start", calls["start"] + 1))
        monkeypatch.setattr(
            runner.jax.profiler, "stop_trace",
            lambda *a, **k: calls.__setitem__("stop", calls["stop"] + 1))
        runner.do_run(run_args(str(root), ckpt, out, watch=3600.0,
                               watch_passes=1, summary="live.json",
                               profile=1))
        assert calls["start"] == 1 and calls["stop"] == 1
