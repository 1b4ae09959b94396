"""Single-file model checkpoints with embedded hparams.

The reference's entire model-metadata story is Lightning's
`save_hyperparameters` into the .ptl checkpoint and
`load_from_checkpoint` recovering classes/resize/img_norm/seed/model_id
(/root/reference/neuston_models.py:54, neuston_net.py:173-174,443). We keep
that contract: one artifact file carries weights + batch_stats + the full
training-args dict, so RUN/EXPORT need nothing else. Format: msgpack
(flax.serialization) with a JSON hparams blob — host-side, works for any
model family, independent of process count.

Orbax-based *step* checkpointing for mid-training resume (which the reference
lacks, SURVEY.md §5.4) lives in train/loop.py; this module is the portable
artifact format.
"""

from __future__ import annotations

import json

import flax.serialization
import jax
import numpy as np

FORMAT_TAG = "ifcbnn-ckpt-v1"


def _jsonable(d: dict) -> dict:
    out = {}
    for k, v in d.items():
        try:
            json.dumps(v)
            out[k] = v
        except (TypeError, ValueError):
            out[k] = str(v)
    return out


def save_checkpoint(path: str, params, batch_stats, hparams: dict):
    payload = {
        "format": FORMAT_TAG,
        "hparams_json": json.dumps(_jsonable(hparams)),
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    blob = flax.serialization.msgpack_serialize(payload)
    with open(path, "wb") as f:
        f.write(blob)


def load_checkpoint(path: str):
    """Returns (params, batch_stats, hparams_dict)."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    if payload.get("format") != FORMAT_TAG:
        raise ValueError(f"{path}: not an ifcbnn checkpoint")
    hparams = json.loads(payload["hparams_json"])
    return payload["params"], payload["batch_stats"], hparams


def save_train_state(path: str, state, extra: dict):
    """Full-fidelity step checkpoint for mid-training resume (params +
    batch_stats + optimizer moments + loop bookkeeping). The reference's
    checkpoints are model artifacts only — no true resume (SURVEY.md §5.4)."""
    import jax
    payload = {
        "format": FORMAT_TAG + "-trainstate",
        "extra_json": json.dumps(_jsonable(extra)),
        "state": flax.serialization.to_state_dict(jax.device_get(state)),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    import os
    os.replace(tmp, path)


def load_train_state(path: str, template_state):
    """Returns (state, extra_dict); template_state supplies the pytree
    structure (build it with create_train_state first)."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    if payload.get("format") != FORMAT_TAG + "-trainstate":
        raise ValueError(f"{path}: not an ifcbnn train-state checkpoint")
    state = flax.serialization.from_state_dict(template_state, payload["state"])
    return state, json.loads(payload["extra_json"])


def tree_float32(tree):
    """Cast all float leaves to f32 (load-time normalization).

    Uses jnp.issubdtype: numpy's issubdtype reports bfloat16 as NON-float
    (kind 'V'), which would silently skip exactly the dtype bf16-compute
    checkpoints contain."""
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda x: (x.astype(np.float32)
                   if jnp.issubdtype(x.dtype, jnp.floating) else x),
        tree)
