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
import os

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


def _fetch_tree(tree):
    """`jax.device_get` that also works when leaves span processes.

    With `--mesh` whose 'model' axis crosses process boundaries (multi-host
    TP), each process holds only its shard of the head kernels — plain
    device_get raises "spans non-addressable devices". Such leaves are
    replicated via `multihost_utils.process_allgather` (a collective: every
    process must call the save path, which the train loop guarantees —
    each rank writes its own outdir). Fully-addressable / replicated leaves
    take the plain fast path, so single-host behavior is unchanged."""
    def one(x):
        if (isinstance(x, jax.Array) and not x.is_fully_addressable
                and not x.is_fully_replicated):
            from jax.experimental import multihost_utils
            # tiled=True is REQUIRED for global non-addressable inputs and
            # yields the global value (global shape), not a stacked copy
            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return jax.device_get(x)
    return jax.tree_util.tree_map(one, tree)


def save_checkpoint(path: str, params, batch_stats, hparams: dict):
    payload = {
        "format": FORMAT_TAG,
        "hparams_json": json.dumps(_jsonable(hparams)),
        "params": _fetch_tree(params),
        "batch_stats": _fetch_tree(batch_stats),
    }
    blob = flax.serialization.msgpack_serialize(payload)
    # atomic (tmp + rename), like save_train_state below: a crash mid-write
    # must not leave a truncated msgpack that end-of-training copies into
    # the published {model_id}.ptl artifact
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Returns (params, batch_stats, hparams_dict).

    Accepts BOTH artifact formats: our msgpack checkpoints and the
    reference's PyTorch-Lightning `.ptl` files (torch zip checkpoints with
    `state_dict` + `hyper_parameters`, neuston_models.py:54,
    neuston_net.py:173-174) — so a site migrating from the reference can
    point RUN/EXPORT/sbatch at its existing trained models with no
    conversion step. Lightning weights are ported tensor-by-tensor
    (models/torch_port.py) including the trained classifier head."""
    with open(path, "rb") as f:
        head = f.read(4)
        if head == b"PK\x03\x04":  # torch zip checkpoint — skip the
            try:                   # msgpack probe (and its full-file read)
                return _load_lightning_checkpoint(path)
            except ValueError:
                raise
            except Exception as e:
                raise ValueError(f"{path}: torch zip that is not a "
                                 f"loadable Lightning checkpoint "
                                 f"({e})") from e
        blob = head + f.read()
    try:
        payload = flax.serialization.msgpack_restore(blob)
        native_err = None if (isinstance(payload, dict)
                              and payload.get("format") == FORMAT_TAG) else \
            ValueError(f"{path}: not an ifcbnn checkpoint")
    except Exception as e:  # not msgpack at all (e.g. a legacy torch file)
        payload, native_err = None, e
    if native_err is None:
        hparams = json.loads(payload["hparams_json"])
        return payload["params"], payload["batch_stats"], hparams
    try:
        return _load_lightning_checkpoint(path)
    except ValueError:
        raise
    except Exception:
        raise native_err


def _load_lightning_checkpoint(path: str):
    """Port a reference `.ptl` Lightning checkpoint to our trees.

    The reference persists the full TRAIN args namespace as hyper_parameters
    (neuston_models.py:50-54), including the keys RUN recovers later:
    MODEL, classes, resize, img_norm, seed, model_id, pretrained
    (neuston_net.py:62,70,173-174; neuston_data.py:344). The net itself
    lives at `self.model`, so state_dict keys carry a 'model.' prefix."""
    try:
        from ..models.torch_port import tolerant_torch_load
        ckpt = tolerant_torch_load(path)
    except ImportError as e:
        raise ValueError(
            f"{path}: looks like a torch/Lightning checkpoint but torch "
            "is not importable in this environment") from e
    if not (isinstance(ckpt, dict) and "state_dict" in ckpt):
        raise ValueError(f"{path}: torch file without a state_dict — "
                         "not a Lightning checkpoint")

    hp = ckpt.get("hyper_parameters") or ckpt.get("hparams") or {}
    if not isinstance(hp, dict):
        hp = vars(hp)  # argparse.Namespace
    if "MODEL" not in hp or "classes" not in hp:
        raise ValueError(
            f"{path}: Lightning checkpoint lacks MODEL/classes hparams "
            "(is this a NeustonModel .ptl?)")
    from ..models import get_namebrand_model, input_size_for
    model_name = str(hp["MODEL"])
    classes = [str(c) for c in hp["classes"]]
    resize = int(hp.get("resize") or input_size_for(model_name))
    sd = {k[len("model."):]: v.detach().cpu().numpy()
          for k, v in ckpt["state_dict"].items() if k.startswith("model.")}

    # shape/dtype template without touching any device (works under the
    # pinned-TPU platform): abstract-init, then materialize host zeros
    import jax.numpy as jnp
    model = get_namebrand_model(model_name, len(classes),
                                pretrained=bool(hp.get("pretrained", True)))
    variables = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, resize, resize, 3), jnp.float32), train=False))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables)
    from ..models.torch_port import port_state_dict
    # on_missing='raise': the template is zeros, so a silent partial port
    # (layout drift, stripped/renamed keys) would serve garbage scores
    params, stats = port_state_dict(
        model_name, sd, template["params"],
        template.get("batch_stats", {}), skip_head=False,
        on_missing="raise")

    hparams = dict(_jsonable(hp))
    hparams.update(MODEL=model_name, classes=classes, resize=resize,
                   img_norm=hp.get("img_norm"),
                   seed=hp.get("seed"), model_id=hp.get("model_id"),
                   pretrained=bool(hp.get("pretrained", True)))
    return params, stats, hparams


def load_hparams(path: str) -> dict:
    """hparams only, WITHOUT building the model or porting weights.

    For submit-time consumers (sbatch resolves {MODEL_ID} on a login
    node): a Lightning `.ptl` stops after reading `hyper_parameters` —
    no eval_shape, no tensor-by-tensor port of hundreds of MB. Native
    msgpack checkpoints still parse the one file (msgpack has no partial
    decode) but skip nothing else."""
    with open(path, "rb") as f:
        head = f.read(4)
        if head == b"PK\x03\x04":  # torch zip checkpoint
            # SAME hardened loader as the full path (allowlist unpickler —
            # raw torch.load here would reopen the ACE hole it closed)
            from ..models.torch_port import tolerant_torch_load
            ckpt = tolerant_torch_load(path)
            hp = ckpt.get("hyper_parameters") or ckpt.get("hparams") or {}
            if not isinstance(hp, dict):
                hp = vars(hp)
            return dict(_jsonable(hp))
        blob = head + f.read()
    payload = flax.serialization.msgpack_restore(blob)
    if not (isinstance(payload, dict)
            and payload.get("format") == FORMAT_TAG):
        raise ValueError(f"{path}: not an ifcbnn checkpoint")
    return json.loads(payload["hparams_json"])


def save_train_state(path: str, state, extra: dict):
    """Full-fidelity step checkpoint for mid-training resume (params +
    batch_stats + optimizer moments + loop bookkeeping). The reference's
    checkpoints are model artifacts only — no true resume (SURVEY.md §5.4)."""
    payload = {
        "format": FORMAT_TAG + "-trainstate",
        "extra_json": json.dumps(_jsonable(extra)),
        "state": flax.serialization.to_state_dict(_fetch_tree(state)),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def restore_trainstate_payload(path: str) -> dict:
    """Read + msgpack-restore a train-state file once. --resume peeks the
    seed out of this payload BEFORE the model exists and then feeds the
    SAME payload to load_train_state — a second full read/parse of a
    ~300 MB params+moments blob per resume would double startup I/O."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    if payload.get("format") != FORMAT_TAG + "-trainstate":
        raise ValueError(f"{path}: not an ifcbnn train-state checkpoint")
    return payload


def load_train_state(path: str, template_state, payload=None):
    """Returns (state, extra_dict); template_state supplies the pytree
    structure (build it with create_train_state first). Pass a
    pre-restored `payload` (restore_trainstate_payload) to skip
    re-reading the file."""
    if payload is None:
        payload = restore_trainstate_payload(path)
    state = flax.serialization.from_state_dict(template_state, payload["state"])
    return state, json.loads(payload["extra_json"])


def peek_train_state_extra(path: str) -> dict:
    """The extra/bookkeeping dict of a train-state checkpoint, without a
    template state (full-file restore; inside do_training prefer
    restore_trainstate_payload and reuse the payload)."""
    return json.loads(restore_trainstate_payload(path)["extra_json"])


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
