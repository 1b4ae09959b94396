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
        jax.distributed.initialize(
            coordinator_address=f"{coordinator}:{coordinator_port}",
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


def shard_manifest(items, labels=None):
    """Per-host slice of a dataset manifest: host i takes items[i::P],
    padded so EVERY host gets exactly ceil(N/P) items (short hosts repeat
    their own first item). Equal lengths are load-bearing: every host must
    execute the same number of collective train/eval steps (unequal counts
    deadlock SPMD) and allgathered metadata must be identically shaped.
    Deterministic across hosts."""
    import jax
    p, n = jax.process_index(), jax.process_count()
    if n == 1:
        return items, labels
    per_host = -(-len(items) // n)
    items_s = list(items)[p::n]
    labels_s = list(labels)[p::n] if labels is not None else None
    if not items_s:  # more hosts than items: borrow globally
        items_s = [list(items)[0]]
        if labels_s is not None:
            labels_s = [list(labels)[0]]
    while len(items_s) < per_host:
        items_s.append(items_s[0])
        if labels_s is not None:
            labels_s.append(labels_s[0])
    return items_s, labels_s
