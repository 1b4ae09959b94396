"""Env-knob hygiene (VERDICT r4 weak #3 / next #2): one inventory, loud
notices for result-altering knobs in production verbs, docs kept in sync.
"""

import io
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ifcb_classifier_tpu.utils import envknobs  # noqa: E402

DOCS = os.path.join(REPO, "docs", "ENV_KNOBS.md")


class TestInventoryComplete:
    def test_every_knob_in_source_is_inventoried(self):
        """Grep the package for IFCBNN_* reads; every hit must be a KNOBS
        key — a new knob added without inventory+docs is a regression of
        the exact 'silent leaked hook' hazard this closes."""
        found = set()
        for root, _dirs, files in os.walk(
                os.path.join(REPO, "ifcb_classifier_tpu")):
            for fn in files:
                if not fn.endswith(".py") or fn == "envknobs.py":
                    # the inventory itself must not count as a "read":
                    # including it makes found ⊇ KNOBS always, so a knob
                    # whose last product read was deleted would never be
                    # flagged stale
                    continue
                with open(os.path.join(root, fn)) as f:
                    # (?<![A-Z_]) keeps the _IFCBNN_DRYRUN_CHILD sentinel
                    # (an internal flag, not an env knob) out of the match
                    found |= set(re.findall(r"(?<![A-Z_])IFCBNN_[A-Z_]+",
                                            f.read()))
        # conftest-only knob is read by tests, not the package
        found.add("IFCBNN_TEST_NO_CACHE")
        assert found == set(envknobs.KNOBS), (
            f"unknown knobs {found - set(envknobs.KNOBS)} / "
            f"stale inventory {set(envknobs.KNOBS) - found}")

    def test_docs_table_in_sync(self):
        """docs/ENV_KNOBS.md must carry one table row per knob with the
        same kind and alters-results verdict as the code inventory."""
        with open(DOCS) as f:
            text = f.read()
        for name, spec in envknobs.KNOBS.items():
            row = next((ln for ln in text.splitlines()
                        if ln.startswith(f"| `{name}`")), None)
            assert row, f"{name} missing from docs/ENV_KNOBS.md"
            cells = [c.strip() for c in row.split("|")]
            assert cells[2] == spec["kind"], (name, cells[2])
            wants = "**yes**" if spec["alters_results"] else "no"
            assert cells[3] == wants, (name, cells[3])


class TestWarnActiveKnobs:
    def test_resize_override_warns(self, monkeypatch):
        monkeypatch.setenv("IFCBNN_RESIZE_OVERRIDE", "64")
        buf = io.StringIO()
        warned = envknobs.warn_active_knobs("VAL", file=buf)
        out = buf.getvalue()
        assert [w[0] for w in warned] == ["IFCBNN_RESIZE_OVERRIDE"]
        assert "NOTICE: VAL: env knob IFCBNN_RESIZE_OVERRIDE=64" in out
        assert "docs/ENV_KNOBS.md" in out

    def test_zero_resize_override_is_inactive(self, monkeypatch):
        """The code treats 0 as 'use the production rule' — no notice."""
        monkeypatch.setenv("IFCBNN_RESIZE_OVERRIDE", "0")
        assert envknobs.warn_active_knobs("TRAIN", file=io.StringIO()) == []

    def test_malformed_value_counts_as_active(self, monkeypatch):
        monkeypatch.setenv("IFCBNN_RESIZE_OVERRIDE", "banana")
        warned = envknobs.warn_active_knobs("TRAIN", file=io.StringIO())
        assert [w[0] for w in warned] == ["IFCBNN_RESIZE_OVERRIDE"]

    def test_perf_only_knobs_stay_quiet(self, monkeypatch):
        monkeypatch.setenv("IFCBNN_NO_BATCH_LADDER", "1")
        monkeypatch.setenv("IFCBNN_STATE_EVERY", "5")
        monkeypatch.setenv("IFCBNN_JAX_CACHE", "/tmp/x")
        buf = io.StringIO()
        assert envknobs.warn_active_knobs("RUN", file=buf) == []
        assert buf.getvalue() == ""

    def test_fold_and_quant_levers_warn(self, monkeypatch):
        monkeypatch.setenv("IFCBNN_NO_FOLD", "1")
        monkeypatch.setenv("IFCBNN_QUANT_RESIDENT", "0")
        warned = envknobs.warn_active_knobs("RUN", file=io.StringIO())
        assert {w[0] for w in warned} == {"IFCBNN_NO_FOLD",
                                         "IFCBNN_QUANT_RESIDENT"}
        # default-direction values are NOT active
        monkeypatch.setenv("IFCBNN_NO_FOLD", "0")
        monkeypatch.setenv("IFCBNN_QUANT_RESIDENT", "1")
        assert envknobs.warn_active_knobs("RUN", file=io.StringIO()) == []


class TestNoticeWiredIntoVerbs:
    def test_train_cli_prints_notice_before_work(self):
        """End-to-end: a TRAIN invocation with the hook leaked must print
        the NOTICE on stderr even though the run itself fails fast on a
        missing SRC — the notice fires before any dispatch."""
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
                   PALLAS_AXON_POOL_IPS="",
                   IFCBNN_RESIZE_OVERRIDE="32")
        r = subprocess.run(
            [sys.executable, "-m", "ifcb_classifier_tpu", "TRAIN",
             "/nonexistent-src-dir", "resnet18", "t1",
             "--outdir", "/tmp/ifcbnn-envknob-test-out"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=120)
        assert r.returncode != 0  # missing SRC must still fail
        assert ("NOTICE: TRAIN: env knob IFCBNN_RESIZE_OVERRIDE=32"
                in r.stderr), r.stderr[-2000:]
