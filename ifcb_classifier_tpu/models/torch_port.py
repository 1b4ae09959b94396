"""Torchvision weight porting: torch state_dict → flax params/batch_stats.

The reference gets ImageNet initialization by downloading torchvision weights
(/root/reference/neuston_models.py:24-42, `pretrained=True`). This environment
has no network and no torchvision, so the equivalent capability is: the user
supplies a torch `state_dict` file (`.pth` saved with torch.save, or an .npz)
and we translate it into our flax trees.

Layout rules:
  conv   torch [O,I,kh,kw]  → flax HWIO [kh,kw,I,O]
  dwconv torch [O,1,kh,kw]  → flax [kh,kw,1,O] (feature_group_count)
  linear torch [O,I]        → flax [I,O]
  bn     weight/bias        → params scale/bias
         running_mean/var   → batch_stats mean/var
  flatten-feeding linears (alexnet classifier_1, vgg classifier_0): our
  modules flatten in torch CHW order on purpose, so no permutation is needed.

Each family has a key-rename map from OUR param paths to torch state_dict
keys, derived from the module names in models/*.py (which were chosen to
mirror the torch names 1:1 with '_' for '.').
"""

from __future__ import annotations

import numpy as np


def tolerant_torch_load(path: str):
    """torch.load that survives Lightning checkpoints in an environment
    without pytorch_lightning: its AttributeDict (a plain dict subclass)
    pickled into hyper_parameters is mapped back to dict at unpickle time.

    This loader exists because `weights_only=True` rejects those pickled
    hparams objects — but it must NOT reopen the arbitrary-code-execution
    hole weights_only closes. find_class is therefore an ALLOWLIST: torch
    tensor-rebuild machinery, stdlib containers, argparse.Namespace, numpy
    reconstruction, and Lightning classes (mapped to dict). Anything else
    fails the unpickle instead of importing attacker-chosen code."""
    import collections
    import pickle
    import types

    import torch

    _SAFE = {
        ("collections", "OrderedDict"): collections.OrderedDict,
        ("collections", "defaultdict"): collections.defaultdict,
        ("argparse", "Namespace"): __import__("argparse").Namespace,
    }

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith(("pytorch_lightning", "lightning")):
                return dict  # AttributeDict et al. -> plain dict
            if (module, name) in _SAFE:
                return _SAFE[(module, name)]
            if module == "torch._utils" and name.startswith("_rebuild"):
                return super().find_class(module, name)
            if module == "torch" and (name.endswith("Storage")
                                      or name in ("Size", "device", "dtype",
                                                  "Tensor")):
                return super().find_class(module, name)
            if module in ("torch.serialization", "torch.storage"):
                return super().find_class(module, name)
            if module.startswith("numpy") and name in (
                    "_reconstruct", "ndarray", "dtype", "scalar"):
                return super().find_class(module, name)
            raise pickle.UnpicklingError(
                f"{module}.{name} is not allowlisted for checkpoint "
                "unpickling (refusing to execute arbitrary classes from "
                "an untrusted model file; if this is a legitimate "
                "Lightning artifact, extend _SAFE in models/torch_port.py)")

    shim = types.ModuleType("_ptl_pickle_shim")
    shim.Unpickler = _Unpickler
    shim.load = lambda f, **kw: _Unpickler(f, **kw).load()
    import inspect
    kwargs = {}
    if "weights_only" in inspect.signature(torch.load).parameters:
        kwargs["weights_only"] = False  # our allowlist is the guard
    return torch.load(path, map_location="cpu", pickle_module=shim, **kwargs)


def _load_state_dict(path: str) -> dict:
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Lightning .ptl: hyper_parameters carry pickled Namespace /
        # AttributeDict objects the weights_only unpickler rejects
        sd = tolerant_torch_load(path)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    if any(k.startswith("model.") for k in sd):
        # NeustonModel wraps the net at self.model (neuston_models.py:56) —
        # strip to torchvision-layout keys
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _efficientnet_torch_key(path: list[str], leaf_name: str) -> str:
    """torchvision EfficientNet-v1 layout: features.0 stem, features.{s+1}.{i}
    MBConv ('block.N' sub-modules whose numbering shifts when expand_ratio==1,
    i.e. stage 0), features.8 head, classifier.1 Linear. SE convs are fc1/fc2.
    """
    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}
    leaf = leaf_map[leaf_name]
    mod = path[0]
    if mod == "stem_conv":
        return f"features.0.0.{leaf}"
    if mod == "stem_bn":
        return f"features.0.1.{leaf}"
    if mod == "head_conv":
        return f"features.8.0.{leaf}"
    if mod == "head_bn":
        return f"features.8.1.{leaf}"
    if mod == "classifier":
        return f"classifier.1.{leaf}"
    # block{s}_{i} . {expand_conv|expand_bn|dw_conv|dw_bn|se_reduce|
    #                 se_expand|project_conv|project_bn} . (conv|bn)
    stage, idx = mod[len("block"):].split("_")
    s = int(stage)
    has_expand = s > 0  # stage 0 is the expand_ratio==1 stage
    off = 1 if has_expand else 0
    sub = path[1]
    table = {
        "expand_conv": "block.0.0", "expand_bn": "block.0.1",
        "dw_conv": f"block.{off}.0", "dw_bn": f"block.{off}.1",
        "se_reduce": f"block.{off + 1}.fc1", "se_expand": f"block.{off + 1}.fc2",
        "project_conv": f"block.{off + 2}.0", "project_bn": f"block.{off + 2}.1",
    }
    return f"features.{s + 1}.{idx}.{table[sub]}.{leaf}"


def _flax_path_to_torch_key(family: str, path: list[str], leaf_name: str) -> str:
    """Map one of OUR param tree paths to the torchvision state_dict key."""
    if family.startswith("efficientnet"):
        return _efficientnet_torch_key(path, leaf_name)
    parts = list(path)

    # module-name translations per family
    def tr(p: str) -> str:
        if family.startswith("resnet"):
            # layer1_0 -> layer1.0 ; ds_conv -> downsample.0 ; ds_bn -> downsample.1
            if p.startswith("layer") and "_" in p:
                stage, idx = p.split("_")
                return f"{stage}.{idx}"
            if p == "ds_conv":
                return "downsample.0"
            if p == "ds_bn":
                return "downsample.1"
        if family.startswith("densenet"):
            # denseblockN_layerM -> features.denseblockN.denselayerM
            if p.startswith("denseblock"):
                blk, lyr = p.split("_")
                return f"features.{blk}.dense{lyr}"
            if p.startswith("transition"):
                t, kind = p.split("_")  # transition1_norm
                return f"features.{t}.{kind}"
            if p in ("conv0", "norm0", "norm5"):
                return f"features.{p}"
        if family in ("alexnet", "squeezenet") or family.startswith("vgg"):
            # features_3 -> features.3 ; classifier_1 -> classifier.1
            if p.startswith(("features_", "classifier_")):
                a, b = p.rsplit("_", 1)
                return f"{a}.{b}"
        if family == "inception_v3":
            # branch3x3dbl_1 etc. keep their torch names verbatim
            return p
        return p

    parts = [tr(p) for p in parts]
    joined = ".".join(parts)
    # inner wrappers: our ConvT names its nn.Conv 'conv'; BatchNormT names
    # 'bn'. torchvision's plain models use bare Conv2d/BatchNorm2d modules so
    # the wrapper level is stripped — EXCEPT inception, whose BasicConv2d
    # keeps .conv/.bn submodule names in the state_dict (e.g.
    # Mixed_5b.branch1x1.conv.weight, .bn.running_mean).
    if family != "inception_v3":
        for suffix in (".conv", ".bn"):
            if joined.endswith(suffix):
                joined = joined[: -len(suffix)]
                break

    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}
    return f"{joined}.{leaf_map[leaf_name]}"


def _transform_leaf(torch_arr: np.ndarray, flax_leaf) -> np.ndarray:
    t = np.asarray(torch_arr)
    want = tuple(flax_leaf.shape)
    if t.ndim == 4:  # conv OIHW -> HWIO
        t = t.transpose(2, 3, 1, 0)
    elif t.ndim == 2:  # linear OI -> IO
        t = t.T
    if tuple(t.shape) != want:
        raise ValueError(f"shape mismatch: torch {torch_arr.shape} -> {t.shape}"
                         f" vs flax {want}")
    return t.astype(np.float32)


def port_state_dict(family: str, state_dict: dict, params, batch_stats,
                    skip_head: bool = True, on_missing: str = "warn"):
    """Fill our (params, batch_stats) trees from a torch state_dict.

    skip_head: leave the classifier head at its fresh initialization — the
    reference's head-surgery semantics (pretrained trunk + new fc,
    neuston_models.py:24-42). Head keys are detected by name ('fc',
    'classifier', 'AuxLogits.fc').
    on_missing: 'warn' prints unmapped keys (partial ports are fine when
    seeding a fresh trunk); 'raise' fails instead — required when the
    caller's template is zeros, where a silent partial port would serve
    garbage scores (checkpoint._load_lightning_checkpoint).
    """
    import jax

    missing, ported = [], []

    def is_head(key: str) -> bool:
        """ONLY the classifier layer the reference re-sizes, per family
        (neuston_models.py:24-42). The hidden vgg/alexnet classifier Linears
        (classifier.1/.4 resp. .0/.3) ARE pretrained trunk and must port;
        squeezenet's classifier.1 conversely IS the head conv."""
        if family == "inception_v3":
            return key.startswith(("fc.", "AuxLogits.fc."))
        if family.startswith("resnet"):
            return key.startswith("fc.")
        if family == "squeezenet":
            return key.startswith("classifier.1.")
        if family == "alexnet" or family.startswith("vgg"):
            return key.startswith("classifier.6.")
        if family.startswith("efficientnet"):
            return key.startswith("classifier.1.")
        # densenet: bare final Linear
        return key in ("classifier.weight", "classifier.bias")

    def fill(tree, collection):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        out = []
        for path, leaf in flat:
            parts = [p.key for p in path]
            leaf_name = parts[-1]
            tkey = _flax_path_to_torch_key(family, parts[:-1], leaf_name)
            if skip_head and is_head(tkey):
                out.append(leaf)
                continue
            if tkey in state_dict:
                try:
                    out.append(_transform_leaf(state_dict[tkey], leaf))
                    ported.append(tkey)
                except ValueError as e:
                    # heads were already skipped BY NAME above when
                    # skip_head is set, so a shape mismatch here is a
                    # TRUNK tensor (e.g. the wrong width/depth variant's
                    # weights) — never silently keep random init
                    raise ValueError(
                        f"torch_port: {tkey} shape mismatch porting "
                        f"{family} ({e}) — wrong variant's weights? "
                        "Refusing a silent partial port") from e
            else:
                missing.append(tkey)
                out.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)

    new_params = fill(params, "params")
    new_stats = fill(batch_stats, "batch_stats")
    if missing:
        if on_missing == "raise":
            raise ValueError(
                f"torch_port: {len(missing)} of our {family} tensors have "
                f"no source key in the state_dict (first few: "
                f"{missing[:5]}) — refusing a partial port")
        print(f"torch_port: {len(missing)} keys not found in state_dict "
              f"(first few: {missing[:5]})")
    print(f"torch_port: ported {len(ported)} tensors")
    return new_params, new_stats


def load_torch_weights(path: str, family: str, params, batch_stats):
    sd = _load_state_dict(path)
    new_params, new_stats = port_state_dict(family, sd, params, batch_stats)
    return dict(params=new_params, batch_stats=new_stats)


def export_state_dict(family: str, params, batch_stats) -> dict:
    """Inverse mapping: our trees → a torch-style state_dict (numpy values).
    Used for round-trip tests and for handing weights back to torch users."""
    import jax

    sd = {}

    def walk(tree):
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        for path, leaf in flat:
            parts = [p.key for p in path]
            tkey = _flax_path_to_torch_key(family, parts[:-1], parts[-1])
            t = np.asarray(leaf)
            if t.ndim == 4:
                t = t.transpose(3, 2, 0, 1)
            elif t.ndim == 2:
                t = t.T
            sd[tkey] = t
    walk(params)
    walk(batch_stats)
    return sd
