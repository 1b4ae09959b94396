"""One rank of a multi-process CPU test job (spawned by
test_multiprocess.py — not collected by pytest itself).

Usage: python mp_worker.py RANK NPROCS PORT MODE ARGS...
  MODE=train: ARGS = SRC OUTDIR_BASE   (per-rank outdir OUTDIR_BASE/rankN)
  MODE=run:   ARGS = SRC CKPT OUTDIR   (shared outdir; bins sharded by rank)

Exercises the real multi-host code paths (train/loop.py n_proc>1 branches,
infer/runner.py bin sharding) with jax.distributed over localhost — the
CPU-backend stand-in for a TPU pod (SURVEY.md §4's fake-backend idiom).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ.setdefault("IFCBNN_RESIZE_OVERRIDE", "32")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    rank, nprocs, port, mode = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=rank)
    assert jax.process_count() == nprocs

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)                    # tests/ (fixtures, make_args)
    sys.path.insert(0, os.path.dirname(here))   # repo root (the package)
    from test_train_loop import make_args

    if mode == "train":
        # every rank gets the SAME outdir, like the sbatch-rendered srun
        # command — do_training itself routes rank>0 to outdir/rank{i}
        # (the shared-outdir race fix); rank 0 owns the documented path
        src, outdir_base = sys.argv[5], sys.argv[6]
        from ifcb_classifier_tpu.train.loop import do_training
        do_training(make_args(src, outdir_base, emax=2, seed=5,
                              batch_size=8))
    elif mode in ("run", "run_gobig"):
        import argparse
        src, ckpt, outdir = sys.argv[5], sys.argv[6], sys.argv[7]
        from ifcb_classifier_tpu.infer.runner import do_run
        args = argparse.Namespace(
            cmd_mode="RUN", SRC=src, MODEL=ckpt, RUN_ID="mp",
            src_type="bin", outdir=outdir, outfile=None, filter=None,
            clobber=False, batch_size=8, loaders=2,
            gobig=(mode == "run_gobig"),
            cmd_timestamp="2026-08-16T00:00:00+00:00", version="test")
        do_run(args)
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(f"RANK {rank} OK", flush=True)


if __name__ == "__main__":
    main()
