"""Args/outdir handling shared by the CLIs.

Mirrors the reference's runtime arg injection and templating
(/root/reference/neuston_net.py:415-444): UTC timestamp, version tag, device
discovery (JAX devices replace the CUDA_VISIBLE_DEVICES parse), and
{TRAIN_ID}/{TRAIN_DATE}/{RUN_ID}/{RUN_DATE}/{MODEL_ID} outdir templating.
Also the args.yml dump (neuston_net.py:126-129's args-log contract).
"""

from __future__ import annotations

import datetime as dt
import os


def enable_compile_cache(cache_dir=None):
    """Persistent XLA compilation cache. Compiles through the axon TPU tunnel
    take minutes for CNN graphs; the cache makes every subsequent process
    start warm (verified ~6x on this host). Call before the first jit runs."""
    import jax
    cache_dir = cache_dir or os.environ.get(
        "IFCBNN_JAX_CACHE", os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def add_runtime_params(args, probe_devices=True):
    """Timestamp + version + device list (neuston_net.py:415-432).

    probe_devices=False skips jax.devices() for submit-time consumers
    (sbatch runs on a login node: a downed axon tunnel makes the first
    backend touch HANG ~40 min — and the re-invoked job recomputes the
    device list itself anyway)."""
    args.cmd_timestamp = dt.datetime.now(dt.timezone.utc).isoformat(
        timespec='seconds')
    try:
        with open('version') as f:
            args.version = f.read().strip()
    except FileNotFoundError:
        args.version = None
    args.devices = []
    if probe_devices:
        try:
            import jax
            args.devices = [str(d) for d in jax.devices()]
        except Exception:
            pass
    return args


def proc_outdir(args, model_id_for_run=None):
    """Outdir templating (neuston_net.py:438-444)."""
    run_date_str, _ = args.cmd_timestamp.split('T')
    if args.cmd_mode == 'TRAIN':
        args.outdir = args.outdir.format(TRAIN_DATE=run_date_str,
                                         TRAIN_ID=args.TRAIN_ID)
    elif args.cmd_mode == 'RUN':
        args.outdir = args.outdir.format(RUN_DATE=run_date_str,
                                         RUN_ID=args.RUN_ID,
                                         MODEL_ID=model_id_for_run)
    elif args.cmd_mode == 'VAL':
        args.outdir = args.outdir.format(VAL_DATE=run_date_str,
                                         VAL_ID=args.VAL_ID)
    return args


def dump_args_yml(args, path):
    """Human-readable hparams dump — the args.yml contract
    (neuston_net.py:126-129). Plain key: value YAML, sorted keys."""
    import yaml
    d = {k: v for k, v in sorted(vars(args).items())}
    with open(path, 'w') as f:
        yaml.safe_dump(d, f, default_flow_style=False, sort_keys=True)


def hparams_dict(args) -> dict:
    """The checkpoint-embedded hparams (the reference's save_hyperparameters
    contract, neuston_models.py:54): everything RUN/EXPORT needs to rebuild
    the model and pipeline."""
    keep = vars(args).copy()
    return keep


def parse_mesh(spec, n_devices):
    """`--mesh DATA[xMODEL]` → (n_data, n_model).

    None/'auto' = all devices on 'data' (pure DP, the workload's natural
    shape). The product must cover every visible device exactly — a silent
    partial mesh would strand chips. Validated here, once, so TRAIN and RUN
    cannot drift."""
    spec_n = str(spec).strip().lower() if spec is not None else None
    if spec_n in (None, "", "auto"):
        return n_devices, 1
    parts = spec_n.replace("×", "x").split("x")
    try:
        n_data = int(parts[0])
        n_model = int(parts[1]) if len(parts) > 1 else 1
        if len(parts) > 2 or n_data < 1 or n_model < 1:
            raise ValueError
    except ValueError:
        raise ValueError(
            f"--mesh must be DATA or DATAxMODEL (got {spec!r})") from None
    if n_data * n_model != n_devices:
        raise ValueError(
            f"--mesh {n_data}x{n_model} needs {n_data * n_model} devices "
            f"but {n_devices} are visible")
    return n_data, n_model


def default_compute_dtype():
    """bf16 on TPU, f32 elsewhere — the one place this policy lives."""
    import jax
    import jax.numpy as jnp
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def resolve_dtype(precision):
    """--precision string -> jnp dtype (None/'auto' -> backend default).
    Shared by TRAIN, RUN, and the CLI engine construction so the precision
    surface cannot drift between paths."""
    import jax.numpy as jnp
    if precision in (None, "auto"):
        return default_compute_dtype()
    if precision == "int8":
        # int8 is an INFERENCE-ENGINE mode (quantized convs, models/quant.py)
        # not a compute dtype — TRAIN and other callers must reject it loudly
        raise ValueError("--precision int8 applies to RUN only "
                         "(post-training quantization of a trained model)")
    table = {"bf16": jnp.bfloat16, "fp32": jnp.float32}
    if precision not in table:
        raise ValueError(f"unknown precision {precision!r} "
                         "(choose auto, bf16, fp32, or int8 for RUN)")
    return table[precision]
