"""Mesh + sharding rules.

The reference's entire distributed story is `Trainer(gpus=len(args.gpus))`
(/root/reference/neuston_net.py:101-107) — implicit single-node DP. Here
parallelism is explicit and TPU-native (SURVEY.md §2.3):

  * a 2-D ('data','model') `jax.sharding.Mesh` over all devices
  * batches sharded along 'data' (pure DP — the one strategy that must be
    excellent for this workload: batch/ROI-stream sharding)
  * parameters replicated, EXCEPT large classifier-head Dense kernels which
    shard their output dim over 'model' (tensor parallelism for the head) —
    XLA inserts the all-gather for the logits automatically from the
    sharding annotations (pjit-style "annotate and let XLA place collectives")
  * gradient psums ride ICI, emitted by XLA from the sharding propagation;
    nothing here talks to a comm library directly

Single chip degenerates to mesh (1,1) with zero overhead.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_data is None:
        n_data = total // n_model
    assert n_data * n_model == total, \
        f"mesh {n_data}x{n_model} != {total} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path: str, leaf, mesh: Mesh) -> P:
    """Shard big Dense kernels ('fc'/'classifier*') over 'model'; replicate
    the rest. Only shards when the output dim divides evenly."""
    n_model = mesh.shape["model"]
    if n_model <= 1:
        return P()
    is_head = any(t in path for t in ("fc", "classifier"))
    if is_head and getattr(leaf, "ndim", 0) == 2 and leaf.shape[1] % n_model == 0:
        return P(None, "model")
    if (is_head and "conv" not in path and getattr(leaf, "ndim", 0) == 1
            and leaf.shape[0] % n_model == 0):
        # Dense-head bias only: squeezenet's CONV head keeps its 4-D kernel
        # replicated (the 2-D rule above never fires for it), so sharding
        # its bias alone would just force a reshard against a replicated
        # conv output every step
        return P("model")
    return P()


def params_shardings(params, mesh: Mesh):
    """Sharding pytree for a param tree (head kernels over 'model')."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = [NamedSharding(mesh, _spec_for_param(jax.tree_util.keystr(p), l, mesh))
              for p, l in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def state_shardings(state, mesh: Mesh):
    """Sharding pytree matching a TrainState: params follow the head-TP rule;
    optimizer moments mirror their matching param's sharding (Adam state is
    param-shaped); batch_stats and step replicated."""
    param_sh = params_shardings(state.params, mesh)
    pstruct = jax.tree_util.tree_structure(state.params)

    def map_opt(node):
        if jax.tree_util.tree_structure(node) == pstruct:
            return param_sh
        return jax.tree_util.tree_map(lambda _: replicated(mesh), node)

    opt_sh = jax.tree_util.tree_map(
        map_opt, state.opt_state,
        is_leaf=lambda n: jax.tree_util.tree_structure(n) == pstruct)
    stats_sh = jax.tree_util.tree_map(lambda _: replicated(mesh),
                                      state.batch_stats)
    return type(state)(params=param_sh, batch_stats=stats_sh,
                       opt_state=opt_sh, step=replicated(mesh))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Pad-aware device_put of a host batch along the 'data' axis."""
    sh = batch_sharding(mesh)
    n = mesh.shape["data"]
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] % n == 0:
            out[k] = jax.device_put(v, sh)
        elif hasattr(v, "shape"):
            if v.ndim >= 2:
                # image-scale tensors must never silently replicate: with
                # replicated inputs AND replicated params XLA computes the
                # whole batch on EVERY device — an n_data-times slowdown
                # with bit-identical (so invisible) results. Callers pad
                # batches to a multiple of the data axis (train/loop.py
                # rounds --batch; engines round batch_size) — a
                # non-divisible tensor here is a caller bug.
                raise ValueError(
                    f"shard_batch: {k!r} leading dim {v.shape[0]} is not "
                    f"divisible by the {n}-way 'data' axis — pad the "
                    "batch; refusing to silently replicate an image-scale "
                    "tensor onto every device")
            out[k] = jax.device_put(v, replicated(mesh))
        else:
            out[k] = v
    return out
