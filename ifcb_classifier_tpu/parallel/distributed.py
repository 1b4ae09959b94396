"""Multi-host initialization — the framework's replacement for both the
reference's implicit NCCL layer and its SLURM job-level fan-out
(SURVEY.md §2.3, §5.8).

One call, driven by environment variables, so the same CLI invocation works
single-host and as one task of a multi-host pod:

  * on Cloud TPU pods, `jax.distributed.initialize()` auto-discovers
    coordinator/process ids from the TPU metadata
  * under SLURM (sbatch --ntasks N), we derive them from SLURM_* vars
  * single host: no-op

After initialize, `jax.devices()` spans the whole pod; the ('data','model')
mesh in parallel/mesh.py then shards the global batch across all chips with
collectives riding ICI (intra-slice) / DCN (inter-slice) as placed by XLA.
Per-host input sharding: each host loads only its own 1/num_processes slice
of the manifest (see shard_manifest below).
"""

from __future__ import annotations

import os


def initialize_from_env(coordinator_port: int = 9377) -> bool:
    """Initialize jax.distributed if a multi-host context is detected.
    Returns True when running multi-host."""
    import jax

    if os.environ.get("IFCBNN_DISABLE_DISTRIBUTED"):
        return False

    # Cloud TPU pod: auto-discovery
    if os.environ.get("TPU_WORKER_HOSTNAMES", "") not in ("", "localhost") or \
            os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return jax.process_count() > 1

    # SLURM multi-task
    ntasks = int(os.environ.get("SLURM_NTASKS", "1"))
    if ntasks > 1:
        coordinator = os.environ.get("IFCBNN_COORDINATOR") or \
            _slurm_first_host(os.environ.get("SLURM_JOB_NODELIST", ""))
        if not coordinator:
            # a silently-empty host would produce coordinator_address
            # ":PORT" and an opaque connection hang/failure deep inside
            # jax.distributed — name the actual missing variable instead
            raise RuntimeError(
                "SLURM_NTASKS={} but no coordinator host could be derived: "
                "SLURM_JOB_NODELIST is unset/unexpandable ({!r}) and "
                "IFCBNN_COORDINATOR is not set — run under srun, or set "
                "IFCBNN_COORDINATOR=<rank0-host>".format(
                    ntasks, os.environ.get("SLURM_JOB_NODELIST", "")))
        # derive the port from the job id (like jax's own SlurmCluster):
        # two jobs whose rank-0 tasks share a node must not collide on one
        # fixed port. IFCBNN_COORDINATOR_PORT overrides.
        port = int(os.environ.get("IFCBNN_COORDINATOR_PORT", "0")) or (
            coordinator_port
            + int(os.environ.get("SLURM_JOB_ID", "0")) % 2 ** 12)
        jax.distributed.initialize(
            coordinator_address=f"{coordinator}:{port}",
            num_processes=ntasks,
            process_id=int(os.environ.get("SLURM_PROCID", "0")))
        return True
    return False


def _slurm_first_host(nodelist: str) -> str:
    """First hostname of a SLURM nodelist. Compressed ranges like
    'node[001-004]' must be expanded (the bare prefix 'node' resolves to
    nothing); `scontrol show hostnames` is SLURM's own expander."""
    import subprocess
    try:
        out = subprocess.run(["scontrol", "show", "hostnames", nodelist],
                             capture_output=True, text=True, timeout=10)
        if out.returncode == 0 and out.stdout.strip():
            return out.stdout.split()[0]
    except (OSError, subprocess.SubprocessError):
        pass
    # fallback: expand 'prefix[a-b,...]' manually for the first entry
    head = nodelist.split(",")[0]
    if "[" in head:
        prefix, rng = head.split("[", 1)
        first = rng.rstrip("]").split(",")[0].split("-")[0]
        return prefix + first
    return head


def shard_manifest(items, labels=None, shard=None, n_shards=None):
    """Per-host slice of a dataset manifest: host i takes items[i::P],
    padded so EVERY host gets exactly ceil(N/P) items (short hosts repeat
    their own first item). Equal lengths are load-bearing: every host must
    execute the same number of collective train/eval steps (unequal counts
    deadlock SPMD) and allgathered metadata must be identically shaped.
    Deterministic across hosts.

    shard/n_shards override the (process_index, process_count) default:
    when the mesh's 'model' axis spans processes (--mesh with data <
    process count), processes in the same mesh data-row form a replica
    GROUP and every member loads the group's shard, so the loop passes
    (group, n_groups) here (train/loop.py).

    Returns (items, labels, n_real): entries at index >= n_real are PADS —
    repeats appended only for step-count equality. Consumers must exclude
    them from loss/metrics (HostLoader's n_real mask) or every host-count
    boundary would double-count a sample and `p + local_index*P` would
    index past the global manifest during gather reconstruction."""
    import jax
    p = jax.process_index() if shard is None else shard
    n = jax.process_count() if n_shards is None else n_shards
    if n == 1:
        return items, labels, len(items)
    if not len(items):
        raise ValueError(
            "cannot shard an EMPTY manifest across {} processes — the "
            "dataset produced no items (e.g. an empty validation split); "
            "fix the dataset/split before launching multi-host".format(n))
    per_host = -(-len(items) // n)
    items_s = list(items)[p::n]
    labels_s = list(labels)[p::n] if labels is not None else None
    n_real = len(items_s)
    if not items_s:  # more hosts than items: borrow globally (all pads)
        items_s = [list(items)[0]]
        if labels_s is not None:
            labels_s = [list(labels)[0]]
    while len(items_s) < per_host:
        items_s.append(items_s[0])
        if labels_s is not None:
            labels_s.append(labels_s[0])
    return items_s, labels_s, n_real


def reconstruct_global_rows(probs_batches, ns, idx, n_proc, batch_local,
                            n_items):
    """Inverse of shard_manifest for allgathered validation outputs: reorder
    per-host rows back to global-manifest indices.

    probs_batches: sequence of [n_proc*batch_local, C] arrays, one per local
                   batch step (probs replicated across hosts; host p's rows
                   occupy [p*batch_local, (p+1)*batch_local))
    ns:  [P, n_batches] int — real (mask=True) row count per host per batch
    idx: [P, n_batches, batch_local] int — local manifest indices, -1 padded
    n_items: global manifest length

    Host p's local item li is global item p + li*n_proc (shard_manifest
    strides items[p::P]). Rows with li < 0 or a global index past n_items
    (manifest pads — already excluded from ns by the loader mask, kept here
    as defense in depth) are dropped. Returns (probs [N, C], global_indices
    list[int]); pure numpy, unit-testable without jax.distributed."""
    import numpy as np
    all_probs, glob_idx = [], []
    n_classes = np.asarray(probs_batches[0]).shape[-1] if probs_batches else 0
    for bi, probs in enumerate(probs_batches):
        probs = np.asarray(probs)
        for p in range(n_proc):
            if bi >= len(ns[p]):
                continue
            n_p = int(ns[p][bi])
            rows = probs[p * batch_local: p * batch_local + n_p]
            loc = idx[p][bi][:n_p]
            keep = [k for k, li in enumerate(loc)
                    if int(li) >= 0 and p + int(li) * n_proc < n_items]
            if not keep:
                continue
            all_probs.append(rows[keep])
            glob_idx.extend(p + int(loc[k]) * n_proc for k in keep)
    if not all_probs:
        return np.zeros((0, n_classes), np.float32), []
    return np.concatenate(all_probs, axis=0), glob_idx
