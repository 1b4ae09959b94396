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

# one device per rank by default; the single-process arm of the step-parity
# test imports this module with its own multi-device XLA_FLAGS already set
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.environ.setdefault("IFCBNN_RESIZE_OVERRIDE", "32")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def step_parity(accum: int, mesh_spec: str):
    """ONE jitted train step (resnet18@32, fixed seed, deterministic batch)
    on the requested mesh, printing the loss and a post-step param
    checksum. Runs identically under N processes x 1 device or 1 process x
    N virtual devices — the parity the composition test asserts. Every
    process (or the single process) feeds the same global batch; replica
    groups (model axis spanning processes) slice their mesh data-row."""
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.parallel.mesh import (make_mesh, replicated,
                                                   state_shardings)
    from ifcb_classifier_tpu.train.state import (create_train_state,
                                                 make_train_step)
    from ifcb_classifier_tpu.utils.config import parse_mesh

    n_dev = jax.device_count()
    n_proc = jax.process_count()
    n_data, n_model = parse_mesh(mesh_spec, n_dev)
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    model = get_namebrand_model("resnet18", 4, dtype=jnp.float32)
    state, tx = create_train_state(model, jax.random.PRNGKey(7), 32)
    sh = state_shardings(state, mesh)
    state = jax.device_put(state, sh)
    step = jax.jit(make_train_step(model, tx, accum=accum),
                   in_shardings=(sh, None, None),
                   out_shardings=(sh, replicated(mesh)),
                   donate_argnums=0)

    B = 16
    r = np.random.RandomState(0)
    g = dict(images=r.rand(B, 32, 32, 3).astype(np.float32),
             labels=r.randint(0, 4, B).astype(np.int32),
             mask=np.ones(B, bool))
    if n_data % n_proc == 0:
        n_groups, group = n_proc, jax.process_index()
    else:  # model axis spans processes: replica groups along data rows
        n_groups, group = n_data, jax.process_index() * n_data // n_proc
    rows = slice(group * B // n_groups, (group + 1) * B // n_groups)
    shd = NamedSharding(mesh, P("data"))
    batch = {k: (jax.device_put(v, shd) if n_proc == 1 else
                 jax.make_array_from_process_local_data(shd, v[rows],
                                                        v.shape))
             for k, v in g.items()}
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    checksum = float(sum(
        jnp.sum(jnp.abs(l.astype(jnp.float32)))
        for l in jax.tree_util.tree_leaves(state.params)))
    print(f"STEP loss={float(loss):.8f} checksum={checksum:.4f}",
          flush=True)


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
        # optional key=value tail: accum=N mesh=AxB (composition tests)
        extra = dict(kv.split("=", 1) for kv in sys.argv[7:])
        kw = {}
        if "accum" in extra:
            kw["accum"] = int(extra["accum"])
        if "mesh" in extra:
            kw["mesh"] = extra["mesh"]
        from ifcb_classifier_tpu.train.loop import do_training
        do_training(make_args(src, outdir_base, emax=2, seed=5,
                              batch_size=8, **kw))
    elif mode == "step":
        # single train step, deterministic batch: --accum x --mesh TP
        # gradient parity vs a single process (test_multiprocess.py)
        step_parity(accum=int(sys.argv[5]), mesh_spec=sys.argv[6])
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
    elif mode == "watch":
        # RUN --watch --summary under real multiple processes (VERDICT r4
        # next #1): pid-hash bin sharding + per-rank summary/sidecar.
        # ARGS = SRC CKPT OUTDIR PASSES [INTERVAL]
        import argparse
        src, ckpt, outdir = sys.argv[5], sys.argv[6], sys.argv[7]
        passes = int(sys.argv[8])
        interval = float(sys.argv[9]) if len(sys.argv) > 9 else 0.3
        from ifcb_classifier_tpu.infer.runner import do_run
        args = argparse.Namespace(
            cmd_mode="RUN", SRC=src, MODEL=ckpt, RUN_ID="mpwatch",
            src_type="bin", outdir=outdir, outfile=None, filter=None,
            clobber=False, batch_size=8, loaders=2, gobig=False,
            watch=interval, watch_settle=0.0, watch_passes=passes,
            summary="summary.json",
            cmd_timestamp="2026-08-16T00:00:00+00:00", version="test")
        do_run(args)
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(f"RANK {rank} OK", flush=True)


if __name__ == "__main__":
    main()
