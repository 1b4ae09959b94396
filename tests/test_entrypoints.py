"""Subprocess smoke tests for every CLI entry point (the user-facing surface
the reference exposes as neuston_net/util/onnx/sbatch scripts)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# PALLAS_AXON_POOL_IPS="" stops sitecustomize from registering the axon
# (real-TPU tunnel) backend in the child at all — without it, whether
# JAX_PLATFORMS=cpu is honored depends on whether another process holds
# the tunnel claim at that moment (observed racy; a child that lands on
# the TPU compiles for minutes and flakes the test)
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
           PALLAS_AXON_POOL_IPS="")


def run(args, **kw):
    return subprocess.run([sys.executable, "-m"] + args, cwd=REPO, env=ENV,
                          capture_output=True, text=True, timeout=120, **kw)


class TestHelpScreens:
    @pytest.mark.parametrize("mod", ["ifcb_classifier_tpu",
                                     "ifcb_classifier_tpu.util_cli",
                                     "ifcb_classifier_tpu.export"])
    def test_help_exits_zero(self, mod):
        r = run([mod, "--help"])
        assert r.returncode == 0, r.stderr

    def test_train_help_lists_reference_flags(self):
        r = run(["ifcb_classifier_tpu", "TRAIN", "--help"])
        for flag in ["--untrain", "--img-norm", "--seed", "--split",
                     "--class-config", "--class-min", "--class-max", "--emax",
                     "--emin", "--estop", "--flip", "--outdir", "--model-id",
                     "--epochs-log", "--args-log", "--onnx", "--results"]:
            assert flag in r.stdout, flag

    def test_run_help_lists_reference_flags(self):
        r = run(["ifcb_classifier_tpu", "RUN", "--help"])
        for flag in ["--type", "--outdir", "--outfile", "--filter", "--clobber"]:
            assert flag in r.stdout, flag

    def test_missing_subcommand_errors(self):
        r = run(["ifcb_classifier_tpu"])
        assert r.returncode != 0
        assert "TRAIN" in r.stderr and "RUN" in r.stderr


class TestDryrunGateSelfProvisions:
    def test_dryrun_multichip_with_stripped_env(self):
        """The driver's multichip gate must pass with NO env help at all.

        Round 3 regressed red (`MULTICHIP_r03.json` ok:false, 'need 8
        devices, have 1') because dryrun_multichip assumed the caller's env
        carried --xla_force_host_platform_device_count. This runs the gate
        in a subprocess with XLA_FLAGS and JAX_PLATFORMS stripped — the
        entry point must provision its own 8-device backend (it re-execs a
        hermetic child). PALLAS_AXON_POOL_IPS="" only keeps the parent off
        the real-TPU tunnel; the provisioning logic under test is identical
        either way (parent sees <8 devices, re-execs)."""
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["PALLAS_AXON_POOL_IPS"] = ""
        code = ("import sys; sys.path.insert(0, %r); "
                "import __graft_entry__; "
                "__graft_entry__.dryrun_multichip(8)" % REPO)
        r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=1500)
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
        assert "dryrun_multichip OK" in r.stdout, r.stdout[-2000:]

    def test_dryrun_multichip_pod_shape_16(self):
        """The gate at a POD shape (n=16, which selects a 4x4 DPxTP mesh):
        cheap assurance that mesh construction, head-sharding divisibility,
        replica groups, and ROI geometry hold at the shapes real hardware
        would use, before that hardware ever appears (VERDICT r4 #5).
        Same stripped-env hermetic-child path as the n=8 driver gate."""
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["PALLAS_AXON_POOL_IPS"] = ""
        code = ("import sys; sys.path.insert(0, %r); "
                "import __graft_entry__; "
                "__graft_entry__.dryrun_multichip(16)" % REPO)
        r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
        assert "dryrun_multichip OK" in r.stdout, r.stdout[-2000:]
        # the pod shape must actually have exercised the 4-wide model axis
        assert "'model': 4" in r.stdout, r.stdout[-2000:]


class TestDryrunProbeStaysOffTheTunnel:
    def test_pinned_tunnel_is_counted_without_backend_init(self):
        """With a non-empty PALLAS_AXON_POOL_IPS (the pinned single-chip
        real-TPU tunnel), the parent-side device-count probe must decide
        "fewer than 8" WITHOUT initializing any jax backend: backend init
        blocks on the tunnel claim, and a downed tunnel hangs ~40 min —
        a gate that probes jax.devices() there goes red on tunnel state
        alone. 203.0.113.7 is TEST-NET (never a live relay), so if a
        regression re-introduces the probe this subprocess hangs/fails
        instead of silently claiming the real chip."""
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["PALLAS_AXON_POOL_IPS"] = "203.0.113.7"
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "import jax\n"
            "from jax._src import xla_bridge\n"
            "assert not xla_bridge.backends_are_initialized()\n"
            "def boom(*a, **k): raise SystemExit('probe initialized a "
            "backend behind a pinned tunnel')\n"
            "jax.devices = boom\n"
            "import __graft_entry__ as g\n"
            "assert g._ambient_devices_below(8) is True\n"
            "assert not xla_bridge.backends_are_initialized()\n"
            "print('PROBE-OK')\n" % REPO)
        r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
        assert "PROBE-OK" in r.stdout


class TestBenchLedgerFailSoft:
    def test_dead_infer_tier_keeps_the_artifact(self, monkeypatch):
        """bench.py's ledger benches two extra inference tiers at round
        end; a tier that dies (tunnel hiccup, OOM) must degrade to an
        error field, never take the train headline down with it."""
        sys.path.insert(0, REPO)
        import bench

        def tiers(precision=None, n_trials=None):
            if precision == "int8":
                raise RuntimeError("tunnel reset by peer")
            return {"value": 7700.0, "mfu_pct": 43.0}

        monkeypatch.setattr(bench, "bench_infer", tiers)
        out = bench._ledger({"value": 2000.0})
        assert out["infer_bf16_imgs_per_sec"] == 7700.0
        assert out["infer_bf16_vs_v100"] == round(7700.0 / 1400, 2)
        assert out["infer_int8_imgs_per_sec"] is None
        assert "tunnel reset by peer" in out["infer_int8_error"]
        assert "infer_int8_vs_v100" not in out
        assert out["train_vs_anchor"]["v100"] == round(2000.0 / 390, 2)
        # the verdict is DERIVED, and honest about the dead tier
        assert "FAILED this run" in out["perf_verdict"]
        assert ">=10x met vs {k80, p100}" in out["perf_verdict"]
        import json as _json
        _json.dumps(out)  # the artifact line must stay serializable

    def test_perf_verdict_tracks_a_regression(self, monkeypatch):
        """The verdict text must be computed from the measured fields
        beside it (the round-4 review caught a hardcoded '>=10x met vs
        K80' that would survive any throughput collapse)."""
        sys.path.insert(0, REPO)
        import bench
        monkeypatch.setattr(
            bench, "bench_infer",
            lambda precision=None, n_trials=None: {"value": 100.0,
                                                   "mfu_pct": 1.0})
        out = bench._ledger({"value": 300.0})  # collapsed train tier
        assert ">=10x NOT met" in out["perf_verdict"]
        assert "roofline ceiling unavailable" in out["perf_verdict"]
        out = bench._ledger({"value": 2000.0,
                             "pct_of_roofline_ceiling": 90.7})
        assert "90.7% of the HBM roofline ceiling" in out["perf_verdict"]


class TestBenchWallBudget:
    """A slow-but-alive tunnel (init fast, each trial 95-207+ s wall) must
    degrade the artifact — fewer trials, skipped tiers — never void it by
    outliving the driver's outer timeout (learned the hard way: a 15-min
    `timeout 900 python bench.py` produced NOTHING)."""

    def test_exhausted_budget_skips_ledger_tiers(self, monkeypatch):
        sys.path.insert(0, REPO)
        import bench
        # _BENCH_T0 is import-time, so any positive elapsed beats this
        monkeypatch.setenv("BENCH_WALL_BUDGET_S", "0.0001")
        monkeypatch.setattr(
            bench, "bench_infer",
            lambda **k: (_ for _ in ()).throw(
                AssertionError("tier ran despite exhausted budget")))
        out = bench._ledger({"value": 2000.0})
        assert out["infer_bf16_imgs_per_sec"] is None
        assert "BENCH_WALL_BUDGET_S exhausted" in out["infer_bf16_error"]
        assert out["infer_int8_imgs_per_sec"] is None
        import json as _json
        _json.dumps(out)

    def test_disabled_budget_never_truncates(self, monkeypatch):
        sys.path.insert(0, REPO)
        import bench
        monkeypatch.setenv("BENCH_WALL_BUDGET_S", "0")  # <= 0 disables
        assert bench._budget_left() == float("inf")

    def test_train_trials_truncate_with_marker(self, monkeypatch):
        """Real (tiny, CPU) bench_train under an exhausted budget: the loop
        must stop after ONE counted trial and mark the payload."""
        sys.path.insert(0, REPO)
        import bench
        monkeypatch.setenv("BENCH_WALL_BUDGET_S", "0.0001")
        monkeypatch.setenv("BENCH_WARMUP_TRIALS", "0")
        monkeypatch.setenv("BENCH_TRIALS", "5")
        monkeypatch.setenv("BENCH_ITERS", "1")
        monkeypatch.setenv("BENCH_BATCH", "2")
        monkeypatch.setenv("BENCH_MODEL", "resnet18")
        monkeypatch.setenv("BENCH_SIZE", "64")
        out = bench.bench_train()
        assert out["budget_truncated"] is True
        assert out["trials_requested"] == 5
        assert len(out["trials"]) == 1
        assert out["value"] and out["value"] > 0
        # a single counted trial has no meaningful spread — must be null,
        # not a 0.0 that reads as "perfectly stable" (ADVICE r4)
        assert out["spread_pct"] is None

    def test_exhausted_budget_skips_designated_warmups(self, monkeypatch):
        """A loop ENTERED with the budget spent must run exactly ONE
        counted trial — the pre-fix break condition (len >= n_warm+1)
        still burned the warmups, overshooting by up to ~10 min of
        worst-case tunnel-slow trials (ADVICE r4)."""
        sys.path.insert(0, REPO)
        import bench
        monkeypatch.setenv("BENCH_WALL_BUDGET_S", "0.0001")
        monkeypatch.setenv("BENCH_WARMUP_TRIALS", "2")  # would be 3 trials
        monkeypatch.setenv("BENCH_TRIALS", "5")
        monkeypatch.setenv("BENCH_ITERS", "1")
        monkeypatch.setenv("BENCH_BATCH", "2")
        monkeypatch.setenv("BENCH_MODEL", "resnet18")
        monkeypatch.setenv("BENCH_SIZE", "64")
        out = bench.bench_train()
        assert out["warmup_trials"] == []
        assert len(out["trials"]) == 1
        assert out["budget_truncated"] is True

    def test_single_trial_exhausted_entry_still_marked(self, monkeypatch):
        """With n_trials=1 and the budget spent on entry, the one counted
        trial ran cold (warmups skipped) — the payload must still carry
        budget_truncated even though len(trials) == n_trials, or the
        ledger publishes a cold outlier as a clean full run."""
        sys.path.insert(0, REPO)
        import bench
        monkeypatch.setenv("BENCH_WALL_BUDGET_S", "0.0001")
        monkeypatch.setenv("BENCH_WARMUP_TRIALS", "2")
        monkeypatch.setenv("BENCH_TRIALS", "1")
        monkeypatch.setenv("BENCH_ITERS", "1")
        monkeypatch.setenv("BENCH_BATCH", "2")
        monkeypatch.setenv("BENCH_MODEL", "resnet18")
        monkeypatch.setenv("BENCH_SIZE", "64")
        out = bench.bench_train()
        assert len(out["trials"]) == 1
        assert out["budget_truncated"] is True

    def test_malformed_budget_falls_back_to_default(self, monkeypatch,
                                                    capsys):
        """BENCH_WALL_BUDGET_S='20m' must degrade to the 1200 default with
        a warning — raising mid-trial-loop voids the very artifact this
        fail-soft knob protects (ADVICE r4)."""
        sys.path.insert(0, REPO)
        import bench
        monkeypatch.setenv("BENCH_WALL_BUDGET_S", "20m")
        assert bench._budget_seconds() == 1200.0
        assert "malformed BENCH_WALL_BUDGET_S" in capsys.readouterr().err
        left = bench._budget_left()  # must not raise
        assert left <= 1200.0

    def test_verdict_marks_degraded_and_skipped_tiers(self, monkeypatch):
        """VERDICT r4 #6: a budget-starved run must (a) say 'skipped (wall
        budget)', never FAILED, for a deliberately skipped tier, and (b)
        prefix the whole verdict with DEGRADED so cross-round artifact
        comparison can't silently mix full and truncated ledgers."""
        sys.path.insert(0, REPO)
        import bench
        monkeypatch.setenv("BENCH_WALL_BUDGET_S", "0.0001")
        monkeypatch.setattr(
            bench, "bench_infer",
            lambda **k: (_ for _ in ()).throw(
                AssertionError("tier ran despite exhausted budget")))
        out = bench._ledger({"value": 2000.0})
        assert "skipped (wall budget)" in out["perf_verdict"]
        assert "FAILED" not in out["perf_verdict"]
        assert out["perf_verdict"].startswith("DEGRADED (wall budget): ")

    def test_verdict_degraded_on_truncated_train(self, monkeypatch):
        """budget_truncated on the train payload alone also flags the
        verdict, even when both infer tiers completed."""
        sys.path.insert(0, REPO)
        import bench
        monkeypatch.setenv("BENCH_WALL_BUDGET_S", "0")  # tiers run fine
        monkeypatch.setattr(
            bench, "bench_infer",
            lambda precision=None, n_trials=None: {"value": 9900.0,
                                                   "mfu_pct": 27.0})
        out = bench._ledger({"value": 2000.0, "budget_truncated": True})
        assert out["perf_verdict"].startswith("DEGRADED (wall budget): ")
        out = bench._ledger({"value": 2000.0})
        assert not out["perf_verdict"].startswith("DEGRADED")

    def test_ledger_runs_int8_tier_first(self, monkeypatch):
        """The deployment tier must be measured before bf16 so it is the
        one that survives a mid-ledger budget exhaustion (VERDICT r4 #6)."""
        sys.path.insert(0, REPO)
        import bench
        monkeypatch.setenv("BENCH_WALL_BUDGET_S", "0")
        order = []

        def spy(precision=None, n_trials=None):
            order.append(precision)
            return {"value": 1.0}

        monkeypatch.setattr(bench, "bench_infer", spy)
        bench._ledger({"value": 2000.0})
        assert order == ["int8", "bf16"]


class TestBenchBackendWatchdog:
    def test_hung_backend_yields_failsoft_artifact_line(self):
        """A downed axon tunnel blocks the first jax.devices() ~40 min; the
        driver's round-end bench must print an honest fail-soft JSON line
        and exit 0 instead of timing out with a VOID artifact. Simulated
        with a stub `jax` whose devices() sleeps past the deadline."""
        code = (
            "import sys, types, time\n"
            "sys.path.insert(0, %r)\n"
            "stub = types.ModuleType('jax')\n"
            "stub.devices = lambda *a, **k: time.sleep(60)\n"
            "sys.modules['jax'] = stub\n"
            "import bench\n"
            "bench._backend_watchdog()\n"
            "raise SystemExit('watchdog returned instead of exiting')\n"
            % REPO)
        env = dict(os.environ, BENCH_DEVICE_TIMEOUT_S="1")
        r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=60)
        assert r.returncode == 0, (r.stdout, r.stderr)
        line = r.stdout.strip().splitlines()[-1]
        import json as _json
        payload = _json.loads(line)
        assert payload["value"] is None
        assert "TPU unavailable" in payload["error"]
        # prior-round context rides along, clearly labeled, never as value
        assert payload.get("last_measured", {}).get("value")

    def test_live_backend_passes_straight_through(self):
        """With an initialized backend the watchdog is a no-op (the test
        process runs on the conftest's 8-device CPU backend)."""
        sys.path.insert(0, REPO)
        import bench
        bench._backend_watchdog()  # must return, not exit

    def test_last_measured_reads_newest_round(self):
        sys.path.insert(0, REPO)
        import bench
        last = bench._last_measured()
        assert last and last["round"] >= 3 and last["value"] > 0


class TestSbatchDryRun:
    def test_renders_script_without_submitting(self, tmp_path):
        r = subprocess.run(
            [sys.executable, "-m", "ifcb_classifier_tpu.sbatch", "--dry-run",
             "--job-name", "tj", "--walltime", "01:00:00",
             "TRAIN", "srcdir", "resnet18", "tid",
             "--outdir", str(tmp_path)],
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        script = tmp_path / "xxxxxx.tj.sbatch"
        assert script.exists()
        content = script.read_text()
        assert "#SBATCH --job-name=tj" in content
        assert "#SBATCH --time=01:00:00" in content
        assert "python -m ifcb_classifier_tpu TRAIN srcdir resnet18 tid" \
            in content
        assert "SRUN Command:" in r.stdout
        # single-task: the command must NOT be srun-wrapped
        assert "srun python" not in content

    def test_multitask_wraps_command_in_srun(self, tmp_path):
        """--ntasks N>1: the script body runs once — only srun launches all
        N processes (each with SLURM_PROCID for jax.distributed); without
        it the lone process waits for peers until walltime."""
        r = subprocess.run(
            [sys.executable, "-m", "ifcb_classifier_tpu.sbatch", "--dry-run",
             "--job-name", "tj4", "--ntasks", "4",
             "TRAIN", "srcdir", "resnet18", "tid",
             "--outdir", str(tmp_path)],
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        content = (tmp_path / "xxxxxx.tj4.sbatch").read_text()
        assert "#SBATCH --ntasks=4" in content
        assert "srun python -m ifcb_classifier_tpu TRAIN" in content


class TestSbatchRunOutdir:
    def test_run_mode_resolves_outdir_placeholders(self, tmp_path):
        """RUN-mode sbatch must resolve {RUN_ID}/{MODEL_ID} like the
        reference (neuston_net.py:438-444) — no literal-brace directories."""
        out_pat = str(tmp_path / "run-output" / "{RUN_ID}" / "{MODEL_ID}")
        r = subprocess.run(
            [sys.executable, "-m", "ifcb_classifier_tpu.sbatch", "--dry-run",
             "--job-name", "rj",
             "RUN", str(tmp_path / "bins"), str(tmp_path / "model.ptl"),
             "myrun", "--outdir", out_pat],
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        resolved = tmp_path / "run-output" / "myrun" / "model"
        assert resolved.is_dir()  # fallback MODEL_ID = ckpt file stem
        assert not (tmp_path / "run-output" / "{RUN_ID}").exists()


class TestSbatchRound5Fixes:
    def test_subcommand_index_skips_option_values(self, tmp_path):
        """`--job-name VAL VAL model src`: the splice must start at the
        real subcommand, not the --job-name VALUE — the reference's bare
        .index() duplicated the token and shifted every positional."""
        r = subprocess.run(
            [sys.executable, "-m", "ifcb_classifier_tpu.sbatch", "--dry-run",
             "--job-name", "VAL",
             "VAL", "srcdir", "model.ptl", "vid",
             "--outdir", str(tmp_path)],
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        content = (tmp_path / "xxxxxx.VAL.sbatch").read_text()
        assert ("python -m ifcb_classifier_tpu VAL srcdir model.ptl vid"
                in content)
        assert "VAL VAL" not in content

    def test_shell_metacharacters_are_quoted(self, tmp_path):
        """Args containing $/;/quotes must be shlex-quoted into the
        rendered sh body — space-only quoting pasted them unescaped and
        the shell expanded/split them at job runtime."""
        evil = "we$ird;name'x"
        r = subprocess.run(
            [sys.executable, "-m", "ifcb_classifier_tpu.sbatch", "--dry-run",
             "--job-name", "q1",
             "TRAIN", "srcdir", "resnet18", evil,
             "--outdir", str(tmp_path)],
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        content = (tmp_path / "xxxxxx.q1.sbatch").read_text()
        import shlex
        assert shlex.quote(evil) in content
        # the quoted CMD line round-trips through shlex to the same argv
        cmd_line = next(ln for ln in content.splitlines()
                        if ln.startswith("python -m ifcb_classifier_tpu"))
        assert shlex.split(cmd_line)[3:] == ["TRAIN", "srcdir", "resnet18",
                                             evil, "--outdir",
                                             str(tmp_path)]

    def test_dry_run_does_not_create_slurm_log_dir(self, tmp_path):
        """--dry-run advertises 'render without submitting' — it must not
        create the --slurm-log-dir tree as a side effect."""
        logdir = tmp_path / "new" / "deep" / "logs"
        r = subprocess.run(
            [sys.executable, "-m", "ifcb_classifier_tpu.sbatch", "--dry-run",
             "--job-name", "d1", "--slurm-log-dir", str(logdir),
             "TRAIN", "srcdir", "resnet18", "tid",
             "--outdir", str(tmp_path)],
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        assert not logdir.exists()

    def test_submit_does_not_probe_devices(self, tmp_path):
        """Submission must never dial the TPU backend (a downed tunnel
        hangs jax.devices() ~40 min on a login node). Simulated by making
        backend init raise loudly via a poisoned pool IP + asserting the
        submit still succeeds fast."""
        env = dict(ENV)
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "import jax\n"
            "def boom(*a, **k): raise SystemExit('submit dialed devices')\n"
            "jax.devices = boom\n"
            "sys.argv = ['ifcbnn-sbatch', '--dry-run', '--job-name', 'nd',"
            " 'TRAIN', 'srcdir', 'resnet18', 'tid', '--outdir', %r]\n"
            "from ifcb_classifier_tpu.sbatch import main_cli\n"
            "main_cli()\n"
            "print('NO-PROBE-OK')\n" % (REPO, str(tmp_path)))
        r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
        assert "NO-PROBE-OK" in r.stdout


class TestSbatchRound3Fixes:
    def test_hparams_without_model_id_falls_back_to_stem(self, tmp_path):
        """A checkpoint whose hparams lack model_id must fall back to the
        file stem — .get() returning None never raised, so the outdir used
        to render as a literal 'None' directory (round-2 advisor)."""
        import jax
        import jax.numpy as jnp
        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        from ifcb_classifier_tpu.train.state import create_train_state
        model = get_namebrand_model("resnet18", 2, dtype=jnp.float32)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), 32)
        ck = tmp_path / "mystem.ptl"
        save_checkpoint(str(ck), state.params, state.batch_stats,
                        dict(MODEL="resnet18", classes=["a", "b"], resize=32))
        out_pat = str(tmp_path / "o" / "{MODEL_ID}")
        r = subprocess.run(
            [sys.executable, "-m", "ifcb_classifier_tpu.sbatch", "--dry-run",
             "--job-name", "rj", "RUN", str(tmp_path / "bins"), str(ck),
             "myrun", "--outdir", out_pat],
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        assert (tmp_path / "o" / "mystem").is_dir()
        assert not (tmp_path / "o" / "None").exists()

    def test_submit_tempfile_is_unique_and_cleaned(self, tmp_path,
                                                   monkeypatch):
        """Real (non-dry-run) submits must not share a fixed /tmp script
        path — two concurrent submits would sbatch each other's script."""
        import sys as _sys
        from ifcb_classifier_tpu import sbatch as sb
        from ifcb_classifier_tpu.cli import argparse_nn
        seen = []

        def fake_run(cmd, **kw):
            seen.append(cmd[1])
            assert os.path.isfile(cmd[1])  # script exists at submit time

            class R:
                returncode = 0
                stdout = "Submitted batch job 42"
                stderr = ""
            return R()

        monkeypatch.setattr(sb.subprocess, "run", fake_run)
        argv = ["prog", "--job-name", "tj", "TRAIN", "src", "resnet18",
                "tid", "--outdir", str(tmp_path)]
        monkeypatch.setattr(_sys, "argv", argv)
        parser = argparse_nn(sb.argparse_sbatch())
        sb.main(parser)
        sb.main(parser)
        assert len(seen) == 2 and seen[0] != seen[1]
        assert all("ifcbnn_" in os.path.basename(p) for p in seen)
        assert not any(os.path.exists(p) for p in seen)  # cleaned up
