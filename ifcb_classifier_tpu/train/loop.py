"""The training orchestrator — replaces the reference's `do_training` +
pytorch-lightning Trainer stack (/root/reference/neuston_net.py:37-160,
neuston_models.py:48-149) with an explicit JAX loop:

  host decode/pack (data/pipeline.py) → device preprocess (ops/preprocess.py)
  → jit train step (train/state.py) over a device mesh (parallel/mesh.py)

Behavior parity checklist (each item cites the reference):
  * model_id {TRAIN_DATE}/{TRAIN_ID} templating          neuston_net.py:40-41
  * seed_everything(seed or random), stored back          neuston_net.py:62
  * training/validation_images.list (sorted)              neuston_net.py:72-75
  * input-size rule 299/224                               neuston_data.py:344
  * flips: x=vertical, y=horizontal, +V applies to val    neuston_data.py:356-364
  * epoch-level val_loss = SUM of per-batch mean losses   neuston_models.py:109
  * best-epoch tracking, strictly-less                    neuston_models.py:114-116
  * early stopping patience on val_loss, min epochs       neuston_net.py:58-59,103
  * per-epoch stdout line for tail -f                     neuston_models.py:126-128
  * epochs.csv (scalars only) + args.yml copies           neuston_net.py:87-95,122-129
  * best ckpt → outdir/{model_id}.ptl w/ embedded hparams neuston_net.py:117-120
  * SaveValidationResults on best epochs per --results    neuston_net.py:50-56

Additions over the reference (SURVEY.md §5): true mid-training resume
(chkpts/last.state carries optimizer state), --profile N jax.profiler trace
capture, --nan-check debug flag.
"""

from __future__ import annotations

import csv
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import get_trainval_datasets, parse_imgnorm
from ..data.pipeline import HostLoader, prefetch
from ..models import get_namebrand_model, input_size_for
from ..ops.preprocess import preprocess_batch
from ..results.validation import (DEFAULT_SERIES, compute_validation_results,
                                  save_validation_results)
from .checkpoint import (load_train_state, save_checkpoint, save_train_state)
from .state import create_train_state, make_eval_step, make_train_step


def seed_everything(seed):
    """Seed python/numpy/jax; returns the concrete seed (random if falsy) —
    the reference's `seed_everything(args.seed or None)` (neuston_net.py:62).

    Multi-host: a falsy seed is drawn ONCE (host 0) and broadcast — the
    per-class split() and class-max sampling define the dataset manifest
    from this seed, and shard_manifest/validation reconstruction assume the
    IDENTICAL manifest on every host; independent per-host draws would
    silently train on overlapping/incomplete shards."""
    if not seed:
        seed = random.SystemRandom().randint(1, 2 ** 31 - 1)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            seed = int(multihost_utils.broadcast_one_to_all(
                np.int64(seed)))
    random.seed(seed)
    np.random.seed(seed & 0xFFFFFFFF)
    return seed


from ..utils.config import default_compute_dtype  # noqa: F401 (re-export)
from ..utils.config import resolve_dtype as _resolve_dtype


class EpochCSV:
    """epochs.csv writer (the reference's hacked CSVLogger,
    neuston_net.py:87-95): like Lightning's ExperimentWriter, the column set
    is the UNION of every scalar metric ever logged (first-seen order), not a
    fixed list — non-scalar values are dropped the same way the reference's
    log_metrics hack filtered input_classes/outputs. A metric that appears
    mid-run backfills empty cells for earlier epochs."""

    def __init__(self, path):
        self.path = path
        self.rows = []

    def log(self, **row):
        # numpy scalars coerce to plain Python: np.float32/np.bool_ are
        # NOT json-serializable, and save_train_state's _jsonable fallback
        # would str() the WHOLE csv_rows history — the next --resume then
        # iterates that string as characters and crashes DictWriter
        def py(v):
            return v.item() if isinstance(v, (np.bool_, np.integer,
                                              np.floating)) else v
        self.rows.append({k: py(v) for k, v in row.items()
                          if isinstance(v, (bool, int, float,
                                            np.bool_, np.integer,
                                            np.floating))})
        fields = []
        for r in self.rows:
            fields.extend(k for k in r if k not in fields)
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            w.writeheader()
            w.writerows(self.rows)


def do_training(args):
    # ARG CORRECTIONS AND CHECKS (neuston_net.py:40-44)
    date_str = args.cmd_timestamp.split("T")[0]
    args.model_id = args.model_id.format(TRAIN_DATE=date_str,
                                         TRAIN_ID=args.TRAIN_ID)
    os.makedirs(args.outdir, exist_ok=True)

    # validate --plot params and --mesh BEFORE the dataset scan (a bad value
    # must not abort minutes into a large-tree walk / hours into the run)
    if getattr(args, "plot_files", None):
        from ..results.plots import validate_plot_files
        validate_plot_files(args.plot_files, which="train")
    from ..utils.config import parse_mesh
    n_dev = len(jax.devices())  # global across processes
    n_proc = jax.process_count()
    n_data, n_model = parse_mesh(getattr(args, "mesh", None), n_dev)
    if n_proc > 1 and n_data % n_proc and n_proc % n_data:
        # each host feeds an equal slice of the global batch
        # (make_array_from_process_local_data): the 'data' axis must either
        # split evenly across hosts (DP) or divide the host count evenly
        # (model axis spanning hosts — replica groups, set up below). This
        # is the ONE mesh/process divisibility gate, computable from argv +
        # device/process counts alone, so it fails HERE, not after the
        # dataset walk
        raise ValueError(
            f"--mesh {n_data}x{n_model}: the data axis must be a "
            f"multiple of the process count ({n_proc}) or divide it "
            "evenly in multi-host runs")
    _resolve_dtype(getattr(args, "precision", None))  # int8 rejected HERE,
    if args.img_norm:                  # not minutes into a large tree walk
        parse_imgnorm(args.img_norm)
    from ..results.validation import validate_result_files
    # same fail-fast rule as --plot: a typo'd placeholder/extension must
    # not crash (or silently no-op) at the first best epoch, hours in
    validate_result_files(getattr(args, "result_files", None) or [],
                          sample_epoch=0)

    # multi-host: every rank runs the IDENTICAL command (sbatch renders one
    # srun line), so a shared --outdir would have N ranks racing the same
    # checkpoint/csv/manifest writes (tmp+rename collides and kills the
    # fleet mid-run). Rank 0 owns the documented outdir; other ranks write
    # their byte-identical copies under rank{i}/ (state is replicated —
    # useful for cross-rank verification, never racing).
    if jax.process_count() > 1 and jax.process_index() > 0:
        args.outdir = os.path.join(args.outdir,
                                   f"rank{jax.process_index()}")
    os.makedirs(args.outdir, exist_ok=True)

    # --resume must reuse the ORIGINAL run's seed (recorded in last.state):
    # the train/val split membership is derived from args.seed, and a
    # no-seed run draws a random one per invocation — without restoration,
    # resuming would silently regenerate a DIFFERENT split, leaking images
    # already trained on into the new validation set. A conflicting
    # explicit --seed is rejected loudly for the same reason. The restored
    # payload is kept and fed to load_train_state below — a second full
    # read/parse of the params+moments blob would double resume startup.
    _resume_state = os.path.join(args.outdir, "chkpts", "last.state")
    _resume_payload = None
    if getattr(args, "resume", False):
        _saved_seed = None
        if os.path.isfile(_resume_state):
            import json as _json

            from .checkpoint import restore_trainstate_payload
            _resume_payload = restore_trainstate_payload(_resume_state)
            _saved_seed = _json.loads(
                _resume_payload["extra_json"]).get("seed")
        if jax.process_count() > 1:
            # SYMMETRIC decision: whether to restore must not depend on a
            # rank's LOCAL rank{i}/ state — a replaced host missing its
            # last.state would otherwise skip the no-seed broadcast inside
            # seed_everything while the others take it (collective
            # mismatch = startup hang). All ranks must agree they have a
            # state (the per-rank copies are replicated by construction);
            # a mixed fleet is a loud error, not a silent divergence.
            from jax.experimental import multihost_utils
            _have = multihost_utils.process_allgather(
                np.int64(1 if _resume_payload is not None else 0))
            if int(_have.min()) != int(_have.max()):
                raise RuntimeError(
                    "--resume: chkpts/last.state exists on some ranks but "
                    "not others (ranks' have-flags: {}). Per-rank states "
                    "are replicated copies — restore the missing "
                    "rank{{i}}/chkpts/last.state or start fresh without "
                    "--resume.".format(_have.tolist()))
        if _saved_seed is not None:
            if args.seed and int(args.seed) != int(_saved_seed):
                raise ValueError(
                    f"--resume: this run was trained with seed "
                    f"{_saved_seed}; resuming with --seed {args.seed} "
                    "would regenerate a different train/val split "
                    "mid-run. Drop --seed or pass the matching one.")
            args.seed = int(_saved_seed)
        elif not args.seed and _resume_payload is not None:
            print("WARNING: resuming a pre-seed-recording run without "
                  "--seed: a fresh random seed will re-draw the train/val "
                  "split — pass the original run's seed (args.yml) to "
                  "keep it.")

    args.seed = seed_everything(args.seed)

    # Datasets + manifests (neuston_net.py:68-75)
    training_dataset, validation_dataset = get_trainval_datasets(args)
    assert training_dataset.classes == validation_dataset.classes
    args.classes = training_dataset.classes
    with open(os.path.join(args.outdir, "training_images.list"), "w") as f:
        f.write("\n".join(sorted(training_dataset.images)))
    with open(os.path.join(args.outdir, "validation_images.list"), "w") as f:
        f.write("\n".join(sorted(validation_dataset.images)))

    # IFCBNN_RESIZE_OVERRIDE: test hook — tiny input sizes keep CPU-compile
    # test runs fast; production always uses the 299/224 rule.
    args.resize = int(os.environ.get("IFCBNN_RESIZE_OVERRIDE", 0)) or \
        input_size_for(args.MODEL)
    img_norm = parse_imgnorm(args.img_norm) if args.img_norm else None
    flip = args.flip or ""
    flip_x, flip_y = "x" in flip, "y" in flip
    flip_val = "+V" in flip

    dtype = _resolve_dtype(getattr(args, "precision", None))
    if getattr(args, "nan_check", False):
        jax.config.update("jax_debug_nans", True)

    # Loaders (reference DataLoader roles, neuston_net.py:80-84).
    # Multi-host: each process loads only its slice of the manifest and
    # contributes a per-host sub-batch; --batch stays the GLOBAL batch size.
    # (n_proc / n_dev / n_data / n_model parsed once in the fail-fast block.)
    tr_items, tr_labels = training_dataset.images, training_dataset.targets
    va_items, va_labels = validation_dataset.images, validation_dataset.targets
    tr_real, va_real = len(tr_items), len(va_items)
    accum = max(1, int(getattr(args, "accum", 1) or 1))
    if args.batch_size % accum:
        args.batch_size = -(-args.batch_size // accum) * accum
        print(f"Rounded batch up to {args.batch_size} "
              f"(divisible by --accum {accum})")
    local_batch = args.batch_size
    # data GROUPS: normally each process is its own data shard. With --mesh
    # whose 'data' axis is SMALLER than the process count, the 'model' axis
    # spans processes — the processes in one mesh data-row form a replica
    # group that must feed IDENTICAL local data (the data-parallel shard is
    # replicated across the group's model-axis devices; jax's
    # make_array_from_process_local_data requires replica hosts to pass the
    # same rows). make_mesh reshapes jax.devices() process-major, so group =
    # the process's data-row index.
    if n_proc > 1 and n_data < n_proc:
        # divisibility already validated in the fail-fast block up top
        n_groups, group = n_data, jax.process_index() * n_data // n_proc
    else:
        n_groups, group = n_proc, jax.process_index()
    if n_proc > 1:
        from ..parallel.distributed import shard_manifest
        tr_items, tr_labels, tr_real = shard_manifest(
            tr_items, tr_labels, shard=group, n_shards=n_groups)
        va_items, va_labels, va_real = shard_manifest(
            va_items, va_labels, shard=group, n_shards=n_groups)
        local_batch = -(-args.batch_size // n_groups)
    cache_images = getattr(args, "cache_images", False)
    train_loader = HostLoader(tr_items, tr_labels,
                              batch_size=local_batch,
                              num_workers=args.loaders, shuffle=True,
                              # group, not process_index: replica-group
                              # members must draw the identical shuffle
                              seed=args.seed + group,
                              balanced=getattr(args, "balanced", False),
                              n_real=tr_real, cache=cache_images)
    val_loader = HostLoader(va_items, va_labels,
                            batch_size=local_batch,
                            num_workers=args.loaders, shuffle=False,
                            n_real=va_real, cache=cache_images)

    # Model + state
    print(f"Initializing {args.MODEL} ({len(args.classes)} classes, "
          f"{np.dtype(dtype).name} compute)...")
    model = get_namebrand_model(args.MODEL, len(args.classes),
                                pretrained=args.pretrained, dtype=dtype)
    rng = jax.random.PRNGKey(args.seed)
    state, tx = create_train_state(
        model, rng, args.resize,
        learning_rate=getattr(args, "learning_rate", 0.001),
        optimizer=getattr(args, "optimizer", "Adam"),
        weight_decay=getattr(args, "weight_decay", 0.0))
    if getattr(args, "weights", None):
        from ..models.torch_port import load_torch_weights
        state = state.replace(**load_torch_weights(
            args.weights, args.MODEL, state.params, state.batch_stats))
        print(f"Loaded ported weights from {args.weights}")
    elif args.pretrained:
        print("NOTE: --pretrained requested but no --weights file given; "
              "initializing randomly (no torchvision downloads here — port "
              "a state_dict with ifcbnn-util PORT_WEIGHTS).")

    mean, std = (img_norm if img_norm else (None, None))

    # Preprocess is FUSED into the train/eval programs: the uint8 canvas
    # batch enters ONE compiled step that resizes (MXU matmuls), normalizes,
    # flips, and trains — no [B,r,r,3] HBM round trip or second dispatch
    # between preprocess and model. Train-path images reach the model in its
    # compute dtype (bf16 on TPU); validation stays f32. Cost: one compile
    # per canvas-ladder size actually seen (usually 1-2 per dataset).
    # --class-norm (the reference's reserved Optimization surface,
    # neuston_net.py:389 "bias results to emphasize smaller classes"):
    # inverse-frequency training-loss weights, sklearn-'balanced' formula
    class_weights = None
    if getattr(args, "class_norm", False):
        counts = np.asarray(training_dataset.count_perclass, np.float64)
        class_weights = counts.sum() / (len(counts) *
                                        np.maximum(counts, 1.0))
        print("Class-normalized loss: weights in [{:.3f}, {:.3f}]".format(
            class_weights.min(), class_weights.max()))

    raw_train_step = make_train_step(model, tx,
                                     remat=getattr(args, "remat", False),
                                     class_weights=class_weights,
                                     accum=accum)
    raw_eval_step = make_eval_step(model)

    def fused_train(state, raw, rng):
        rng_pp, rng_do = jax.random.split(rng)
        images = preprocess_batch(raw["canvas"], raw["sizes"], rng_pp,
                                  out_size=args.resize, mean=mean, std=std,
                                  flip_x=flip_x, flip_y=flip_y, dtype=dtype)
        return raw_train_step(state, dict(images=images,
                                          labels=raw["labels"],
                                          mask=raw["mask"]), rng_do)

    def fused_eval(state, raw, rng_b):
        images = preprocess_batch(raw["canvas"], raw["sizes"], rng_b,
                                  out_size=args.resize, mean=mean, std=std,
                                  flip_x=flip_x and flip_val,
                                  flip_y=flip_y and flip_val,
                                  dtype=jnp.float32)
        return raw_eval_step(state, dict(images=images,
                                         labels=raw["labels"],
                                         mask=raw["mask"]))

    # Device mesh: with >1 device the batch shards over 'data' and (with
    # --mesh DATAxMODEL) the classifier head over 'model' (parallel/mesh.py);
    # XLA emits the gradient psums/all-gathers from the sharding
    # annotations. Single device degenerates to plain jit.
    _place_state = lambda s: s  # noqa: E731 — mesh block overrides
    if n_dev > 1:
        from ..parallel.mesh import (make_mesh, replicated, shard_batch,
                                     state_shardings)
        # mesh/process divisibility already gated in the fail-fast block
        # up top (parse-once: n_data/n_model/n_proc/n_dev from there).
        # each micro-batch (batch/accum rows) must itself shard evenly
        # over the 'data' axis, so the divisor is n_data*accum
        div = n_data * accum
        if args.batch_size % div:
            args.batch_size = -(-args.batch_size // div) * div
            print(f"Rounded batch up to {args.batch_size} "
                  f"(divisible by {n_data} data-parallel devices"
                  f"{f' x --accum {accum}' if accum > 1 else ''})")
        local_batch = args.batch_size // n_groups
        train_loader.batch_size = local_batch
        val_loader.batch_size = local_batch
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        sh = state_shardings(state, mesh)
        if _resume_payload is None:
            # resume replaces every leaf with the checkpoint's host arrays
            # right below — an eager device_put of the RANDOM init here
            # wasted a full params+moments transfer (~12 s of the ~25 MB/s
            # tunnel for inception+Adam) per resume
            state = jax.device_put(state, sh)
        _place_state = lambda s: jax.device_put(s, sh)  # noqa: E731
        train_step = jax.jit(fused_train,
                             in_shardings=(sh, None, None),
                             out_shardings=(sh, replicated(mesh)),
                             donate_argnums=0)
        # replicated eval outputs: every host can fetch the full probs
        eval_step = jax.jit(fused_eval,
                            out_shardings=(replicated(mesh), replicated(mesh)))
        if n_proc > 1:
            # assemble the global batch from per-host (or per replica
            # GROUP) sub-batches; XLA sees one logical [B_global, ...]
            # array sharded over 'data'. global_shape is explicit because
            # with model-axis-spanning groups the inference "global = local
            # x process_count" would over-count replica hosts
            from jax.sharding import NamedSharding, PartitionSpec as P
            from jax.experimental import multihost_utils

            def put_batch(b):
                # CROSS-HOST CANVAS-LADDER SYNC: each host packs its OWN
                # shard at the smallest ladder rung covering it
                # (pack_canvas_batch), so on heterogeneous real bins two
                # hosts can pick different S for the same step — then
                # every process hands make_array_from_process_local_data
                # a different global shape and traces a DIFFERENT program
                # (mismatched collectives -> SPMD deadlock mid-epoch).
                # All-reduce the rung to its max and pad local canvases up
                # to it; `sizes` stays the truth so preprocess ignores the
                # extra zeros. One tiny allgather per step (every host
                # runs equal step counts — shard_manifest pads for that).
                canvas = b["canvas"]
                S = int(canvas.shape[1])
                gS = int(multihost_utils.process_allgather(
                    np.int32(S)).max())
                if gS != S:
                    pad = [(0, 0), (0, gS - S), (0, gS - S)]
                    pad += [(0, 0)] * (canvas.ndim - 3)
                    b = dict(b, canvas=np.pad(canvas, pad))
                out = {}
                for k, v in b.items():
                    sh = NamedSharding(mesh, P("data"))
                    gshape = (v.shape[0] * n_groups,) + v.shape[1:]
                    out[k] = jax.make_array_from_process_local_data(
                        sh, v, gshape)
                return out
        else:
            put_batch = lambda b: shard_batch(b, mesh)  # noqa: E731
        print(f"Mesh: {n_data} data-parallel x {n_model} model-parallel "
              f"devices ({n_proc} process{'es' if n_proc > 1 else ''})")
    else:
        train_step = jax.jit(fused_train, donate_argnums=0)
        eval_step = jax.jit(fused_eval)
        put_batch = lambda b: b  # noqa: E731

    # Outputs
    chkpt_dir = os.path.join(args.outdir, "chkpts")
    os.makedirs(chkpt_dir, exist_ok=True)
    epoch_csv = EpochCSV(os.path.join(args.outdir, "logs_epochs.csv"))
    result_files = args.result_files or [
        ["results.mat"] + DEFAULT_SERIES]

    from ..utils.config import hparams_dict
    hparams = hparams_dict(args)

    best_val_loss = np.inf
    best_epoch = 0
    best_ckpt_path = None
    start_epoch = 0
    profile_steps = int(getattr(args, "profile", 0) or 0)
    profile_open = False  # trace started but not yet stopped

    # mid-training resume (beyond-reference capability, SURVEY.md §5.4):
    # chkpts/last.state carries params+opt moments+loop bookkeeping
    last_state_path = os.path.join(chkpt_dir, "last.state")
    if _resume_payload is not None:
        state, extra = load_train_state(last_state_path, state,
                                        payload=_resume_payload)
        state = _place_state(state)  # mesh placement of the LOADED leaves
        _resume_payload = None  # free the host copy (params + moments)
        start_epoch = extra["epoch"] + 1
        best_val_loss = extra["best_val_loss"]
        best_epoch = extra["best_epoch"]
        best_ckpt_path = extra.get("best_ckpt_path")
        epoch_csv.rows = extra.get("csv_rows", [])
        # restore the carried PRNG key so the resumed augmentation/dropout
        # stream is identical to an uninterrupted run (older .state files
        # without it fall back to a seed-derived key — documented deviation)
        if "rng" in extra:
            rng = jnp.asarray(extra["rng"], dtype=jnp.uint32)
        else:
            rng = jax.random.PRNGKey(args.seed + start_epoch)
        train_loader._epoch = start_epoch
        print(f"Resumed from {last_state_path} at epoch {start_epoch}")

    val_rng = jax.random.PRNGKey((args.seed ^ 0x5EED) & 0x7FFFFFFF)

    def run_validation(state, epoch=0):
        """Returns (val_loss_sum, probs, input_classes, input_srcs).

        Multi-host (n_proc>1): each host streams its manifest slice; probs
        come back replicated (global batch in), and per-host rows are
        reassembled into global order via allgathered manifest indices
        (strings can't ride collectives, so paths are resolved from indices
        on every host — the global validation manifest is identical
        everywhere). Hardware-unvalidated here (single-host env); guarded so
        the single-process path is byte-identical to before.
        """
        losses, probs_l, ns, classes_l, srcs = [], [], [], [], []
        gathered_idx = []
        for bi, b in enumerate(prefetch(iter(val_loader))):
            # fresh key per batch AND epoch: with --flip ...+V the reference
            # re-samples val flips per image per pass (neuston_data.py:356-364);
            # a constant key would freeze flip decisions by batch-row position
            rng_b = jax.random.fold_in(val_rng, epoch * 100003 + bi)
            loss, probs = eval_step(state, put_batch(dict(
                canvas=b["canvas"], sizes=b["sizes"],
                labels=np.asarray(b["labels"]),
                mask=np.asarray(b["mask"]))), rng_b)
            n = int(b["mask"].sum())
            losses.append(loss)          # device scalars — fetched once below
            probs_l.append(probs)
            ns.append(n)
            if n_proc == 1:  # labels/paths used only by this host's return
                classes_l.append(b["labels"][:n])
                srcs.extend(val_loader.items[i] for i in b["indices"][:n])
            else:  # indices ride the allgather; labels/paths resolve from
                gathered_idx.append(b["indices"][:n])  # the global manifest
        # f64 accumulation: per-batch losses were Python floats in the
        # reference (.item()), so the epoch sum must not lose f32 bits —
        # the strictly-less best-epoch comparison rides on it
        if n_proc == 1:
            losses = jax.device_get(losses)
            probs_l = [p[:n] for p, n in zip(jax.device_get(probs_l), ns)]
            return (float(np.sum(losses, dtype=np.float64)),
                    np.concatenate(probs_l), np.concatenate(classes_l), srcs)

        from jax.experimental import multihost_utils

        from ..parallel.distributed import reconstruct_global_rows
        B_local = val_loader.batch_size
        # global probs per batch: [B_global, C]; this GROUP's rows live at
        # [group*B_local : group*B_local+n]; other groups' rows are
        # recovered by allgathering (probs already replicated;
        # masks/indices gathered). With model-axis-spanning groups the
        # gather carries duplicate replica metadata — keep one
        # representative process per group (the first; process order is
        # mesh data-row-major), so reconstruction sees exactly n_groups
        # distinct shards
        probs_g = jax.device_get(probs_l)
        local_meta = dict(
            ns=np.asarray(ns, np.int32),
            idx=np.stack([np.pad(i, (0, B_local - len(i)), constant_values=-1)
                          for i in gathered_idx]))
        meta = multihost_utils.process_allgather(local_meta, tiled=False)
        reps = [g * (n_proc // n_groups) for g in range(n_groups)]
        va_all = validation_dataset.images
        lab_all = validation_dataset.targets
        all_probs, glob_idx = reconstruct_global_rows(
            probs_g, meta["ns"][reps], meta["idx"][reps], n_groups,
            B_local, len(va_all))
        losses = jax.device_get(losses)
        return (float(np.sum(losses, dtype=np.float64)), all_probs,
                np.asarray([lab_all[g] for g in glob_idx]),
                [va_all[g] for g in glob_idx])

    epoch = start_epoch
    state_saved_epoch = -1
    trained_this_invocation = False  # a --resume of a COMPLETED run must
    # not rewrite last.state: `epoch` pre-set above names an epoch that
    # never ran, and each no-op resume would advance the cursor by one
    step_count = 0
    # --resume of an EARLY-STOPPED run must also be a no-op: the stop
    # condition below only fires AFTER an epoch completes, so without this
    # pre-check every resume (e.g. an sbatch requeue) trained exactly one
    # extra epoch past the stop point — silently rewriting the published
    # best-ckpt/csv artifacts, one epoch further per resume
    loop_start = start_epoch
    if (start_epoch > 0 and args.estop
            and (start_epoch - 1) - best_epoch >= args.estop):
        print(f"Resume: run already early-stopped after epoch "
              f"{start_epoch - 1} (best epoch {best_epoch}, no improvement "
              f"for {args.estop} epochs) — nothing left to train")
        loop_start = args.emax  # empty range: fall through like a no-op
    for epoch in range(loop_start, args.emax):
        trained_this_invocation = True
        # --- train ---
        t0 = time.time()
        epoch_losses = []  # device scalars; ONE host sync at epoch end —
        # a per-step float(loss) would serialize host<->device every step
        # (the reference's .item() per batch, neuston_models.py:85; the sum
        # is identical, just fetched asynchronously)
        n_imgs = 0
        for b in prefetch(iter(train_loader)):
            rng, rng_sub = jax.random.split(rng)
            if profile_steps and step_count == 2:
                jax.profiler.start_trace(os.path.join(args.outdir, "profile"))
                profile_open = True
            batch = put_batch(dict(canvas=b["canvas"], sizes=b["sizes"],
                                   labels=np.asarray(b["labels"]),
                                   mask=np.asarray(b["mask"])))
            state, loss = train_step(state, batch, rng_sub)
            epoch_losses.append(loss)
            n_imgs += int(b["mask"].sum())
            step_count += 1
            if profile_steps and step_count == 2 + profile_steps:
                jax.profiler.stop_trace()
                profile_steps = 0
                profile_open = False
        agg_train_loss = float(np.sum(jax.device_get(epoch_losses),
                                      dtype=np.float64))
        train_time = time.time() - t0

        # --- validate (epoch-level sum of batch means, neuston_models.py:109) ---
        val_loss, outputs, input_classes, input_srcs = run_validation(state,
                                                                      epoch)
        output_classes = np.argmax(outputs, axis=1)

        from sklearn import metrics as _m
        f1_weighted = _m.f1_score(input_classes, output_classes,
                                  average="weighted")
        f1_macro = _m.f1_score(input_classes, output_classes, average="macro")

        is_best = val_loss < best_val_loss
        if is_best:
            best_val_loss = val_loss
            best_epoch = epoch

        eoe = ('Best Epoch: {}, train_loss: {:.3f}, val_loss: {:.3f}, '
               'val_f1_w={:02.1f}%, val_f1_m={:02.1f}% [{:.1f}s, {:.0f} img/s]')
        print(eoe.format(True if epoch == best_epoch else best_epoch + 1,
                         agg_train_loss, val_loss, 100 * f1_weighted,
                         100 * f1_macro, train_time,
                         n_imgs / max(train_time, 1e-9)), flush=True)

        epoch_csv.log(epoch=epoch, best=(best_epoch == epoch),
                      train_loss=agg_train_loss, val_loss=val_loss,
                      f1_macro=f1_macro, f1_weighted=f1_weighted)

        if is_best:
            # checkpoint (ModelCheckpoint monitor=val_loss, neuston_net.py:98-100)
            best_ckpt_path = os.path.join(chkpt_dir, f"epoch={epoch}.ckpt")
            save_checkpoint(best_ckpt_path, state.params, state.batch_stats,
                            hparams)
            # validation-results files on best epoch (neuston_callbacks.py:32-33)
            results = None
            for rf in result_files:
                fname, series = rf[0], rf[1:]
                results = compute_validation_results(
                    series or DEFAULT_SERIES,
                    class_labels=args.classes,
                    input_classes=input_classes, output_scores=outputs,
                    image_fullpaths=input_srcs, model_id=args.model_id,
                    timestamp=args.cmd_timestamp,
                    counts_perclass=[v + t for v, t in zip(
                        validation_dataset.count_perclass,
                        training_dataset.count_perclass)],
                    val_counts_perclass=validation_dataset.count_perclass,
                    train_counts_perclass=training_dataset.count_perclass,
                    training_image_fullpaths=training_dataset.images,
                    training_classes=training_dataset.targets)
                outfile = os.path.join(args.outdir, fname).format(epoch=epoch)
                os.makedirs(os.path.dirname(outfile) or ".", exist_ok=True)
                save_validation_results(outfile, results)
            # plot files on best epoch — the reference's reserved-but-TODO
            # `-p/--plot FNAME PARAM...` surface (neuston_net.py:48,379,455)
            for pf in (getattr(args, "plot_files", None) or []):
                from ..results.plots import save_training_plots
                fname, plot_params = pf[0], pf[1:]
                save_training_plots(
                    os.path.join(args.outdir, fname).format(epoch=epoch),
                    plot_params, epoch_rows=epoch_csv.rows,
                    class_labels=args.classes, input_classes=input_classes,
                    output_scores=outputs,
                    counts_perclass=validation_dataset.count_perclass,
                    model_id=args.model_id, epoch=epoch)

        # IFCBNN_STATE_EVERY=N thins the resume-state cadence: the full
        # params+moments fetch/write every epoch (~300 MB for inception+
        # Adam) dominates cheap epochs on small datasets and slow links.
        # Best epochs always save so resume never loses the selection
        # bookkeeping; default 1 = every epoch (exact resume).
        state_every = max(1, int(os.environ.get("IFCBNN_STATE_EVERY", "1")))
        if is_best or (epoch + 1) % state_every == 0:
            save_train_state(last_state_path, state, dict(
                epoch=epoch, best_val_loss=best_val_loss,
                best_epoch=best_epoch, best_ckpt_path=best_ckpt_path,
                csv_rows=epoch_csv.rows, seed=args.seed,
                rng=[int(x) for x in np.asarray(jax.device_get(rng))]))
            state_saved_epoch = epoch

        # early stopping (EarlyStopping('val_loss', patience), neuston_net.py:58-59;
        # min_epochs gate neuston_net.py:103)
        if args.estop and (epoch - best_epoch) >= args.estop:
            if epoch + 1 >= args.emin:
                print(f"Early stopping at epoch {epoch} "
                      f"(no improvement for {args.estop} epochs)")
                break

    if profile_open:  # run ended before N profiled steps — flush the trace
        jax.profiler.stop_trace()

    # IFCBNN_STATE_EVERY>1 may leave last.state at an earlier epoch; write
    # the FINAL epoch's state so --resume of a completed run stays a no-op
    # (it would otherwise silently re-train and rewrite the tail outputs)
    if epoch_csv.rows and trained_this_invocation \
            and state_saved_epoch != epoch:
        save_train_state(last_state_path, state, dict(
            epoch=epoch, best_val_loss=best_val_loss,
            best_epoch=best_epoch, best_ckpt_path=best_ckpt_path,
            csv_rows=epoch_csv.rows, seed=args.seed,
            rng=[int(x) for x in np.asarray(jax.device_get(rng))]))

    # Copy best model (neuston_net.py:117-120)
    output_path = os.path.join(args.outdir, args.model_id + ".ptl")
    if best_ckpt_path:
        from shutil import copyfile
        copyfile(best_ckpt_path, output_path)
        print(f"Best model: {output_path}")

    # Logs (neuston_net.py:122-129)
    if args.epochs_log and epoch_csv.rows:  # no epochs ran -> no csv file
        from shutil import copyfile
        copyfile(epoch_csv.path, os.path.join(args.outdir, args.epochs_log))
    if args.args_log:
        from ..utils.config import dump_args_yml
        dump_args_yml(args, os.path.join(args.outdir, args.args_log))

    # Inline export (the reference's TRAIN --onnx, neuston_net.py:131-160):
    # --onnx emits the genuine {model_id}.onnx + .classes the reference's
    # flag produced; --export emits the TPU-native StableHLO artifact
    if getattr(args, "onnx", False) and best_ckpt_path:
        from ..export import export_onnx
        export_onnx(output_path,
                    os.path.join(args.outdir, args.model_id + ".onnx"))
    if getattr(args, "export", False) and best_ckpt_path:
        from ..export import export_model
        export_model(output_path,
                     os.path.join(args.outdir, args.model_id + ".stablehlo"))

    return output_path
