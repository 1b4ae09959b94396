"""SLURM submission CLI — the reference's neuston_sbatch.py
(/root/reference/neuston_sbatch.py): wraps the full TRAIN/RUN arg tree,
renders an sbatch script, submits it, and archives a job-id-named copy.

TPU-native adjustments: the rendered job requests TPU resources via a
generic `--gres` string (default keeps the reference's gpu:1 shape so
existing cluster configs keep working), loads no CUDA modules, and the
command line re-invokes `python -m ifcb_classifier_tpu ...`. Multi-host
TPU pods use `--ntasks N`: the rendered script launches the command via
`srun` (one process per task; each discovers its jax.distributed process
id from SLURM_PROCID, parallel/distributed.py).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

SBATCH_TEMPLATE = """#!/bin/sh
#SBATCH --job-name={JOB_NAME}
#SBATCH --ntasks={NTASKS}
#SBATCH --cpus-per-task={CPU_NUM}
#SBATCH --mem-per-cpu={MEM_PER_CPU}
#SBATCH --time={WALLTIME}
#SBATCH --mail-type=ALL
#SBATCH --mail-user={EMAIL}
#SBATCH --partition={PARTITION}
#SBATCH --gres={GRES}
#SBATCH --output={SLURM_LOG_DIR}/{SLURM_LOG_FILE}

# run from the submission tree
cd {ABS_CWD}

# job provenance in the log
echo "Job ID: $SLURM_JOB_ID, JobName: $SLURM_JOB_NAME"
hostname; pwd; date

# site environment hook (--env-setup)
{ENV_SETUP}
echo "environment ready"

# the training / inference command
{CMD}
"""

DEFAULTS = dict(JOB_NAME="NN", WALLTIME="24:00:00", NTASKS=1,
                PARTITION="tpu", GRES="tpu:1", CPU_NUM=4, MEM_PER_CPU=10240,
                SLURM_LOG_DIR="slurm-logs", SLURM_LOG_FILE="%j.%x.out",
                ENV_SETUP="source activate ifcbnn")


# pre-subcommand flags that take NO value (argparse store_true): a
# subcommand token right after one of these is the real subcommand, not an
# option value. Every other pre-subcommand option consumes the next token.
_VALUELESS_PRE_FLAGS = {"--dry-run", "--remat"}


def _subcommand_index(argv, cmd):
    """Index of the TRAIN|RUN|VAL token in argv — the first occurrence NOT
    positioned as some option's value. The reference's bare .index()
    (neuston_sbatch.py:72) splices from `--job-name VAL`'s VALUE,
    duplicating the token and shifting every positional (QUIRKS.md)."""
    for i in range(1, len(argv)):
        if argv[i] != cmd:
            continue
        prev = argv[i - 1]
        if (not prev.startswith("-") or prev in _VALUELESS_PRE_FLAGS
                or "=" in prev):
            return i
    return argv.index(cmd)  # unreachable for parseable argv; be safe


def default_email():
    try:
        return "{}@localhost".format(os.getlogin())
    except OSError:
        return "user@localhost"


def main(parser):
    sbatch_dict = DEFAULTS.copy()
    sbatch_dict["EMAIL"] = default_email()
    sbatch_dict["ABS_CWD"] = os.getcwd()

    args = parser.parse_args()
    if args.cmd_mode is None:
        parser.error('missing sub-command: specify "TRAIN", "RUN", '
                     'or "VAL".')

    from .utils.config import add_runtime_params, proc_outdir
    # probe_devices=False: submitting must never dial the TPU tunnel (a
    # downed claim hangs jax.devices() ~40 min on a login node); the job
    # recomputes its own device list at runtime
    add_runtime_params(args, probe_devices=False)
    if args.cmd_mode in ("TRAIN", "VAL"):
        proc_outdir(args)
    elif args.cmd_mode == "RUN":
        # resolve {RUN_ID}/{MODEL_ID} here too (the reference does,
        # neuston_net.py:438-444) — otherwise SLURM logs and the archived
        # script land in a directory literally named '{RUN_ID}'.
        # load_hparams, not load_checkpoint: submit time must not port
        # hundreds of MB of weights just to read one string
        try:
            from .train.checkpoint import load_hparams
            model_id = load_hparams(args.MODEL).get("model_id")
        except Exception:  # ckpt not present at submit time (job chains)
            model_id = None
        if not model_id:  # missing hparams key must also hit the fallback,
            # else the outdir renders as a literal 'None' directory
            model_id = os.path.splitext(os.path.basename(args.MODEL))[0]
        proc_outdir(args, model_id_for_run=model_id)

    for key in list(sbatch_dict):
        arg = getattr(args, key.lower(), None)
        if arg is not None:
            sbatch_dict[key] = arg
    if args.slurm_log_dir is None and hasattr(args, "outdir"):
        sbatch_dict["SLURM_LOG_DIR"] = args.outdir
    if args.conda_env:
        sbatch_dict["ENV_SETUP"] = "source activate {}".format(args.conda_env)
    if not args.dry_run:
        # a --dry-run preview must not create directories as a side effect
        os.makedirs(sbatch_dict["SLURM_LOG_DIR"], exist_ok=True)

    # splice argv from the TRAIN|RUN|VAL token into the re-invoked command
    # (neuston_sbatch.py:72-78 role; two reference quirks FIXED here, see
    # QUIRKS.md: naive first-occurrence index — `--job-name VAL VAL ...`
    # spliced from the option VALUE, duplicating the token and shifting
    # every positional — and space-only quoting, which pasted `$`, `;`,
    # quotes etc. unescaped into the sh script body)
    import shlex
    idx = _subcommand_index(sys.argv, args.cmd_mode)
    nn_args = [shlex.quote(a) for a in sys.argv[idx:]]
    cmd = "python -m ifcb_classifier_tpu {}".format(" ".join(nn_args))
    if int(sbatch_dict["NTASKS"]) > 1:
        # multi-host: the batch script body runs ONCE on the first node —
        # srun is what launches all NTASKS processes (each with its own
        # SLURM_PROCID, which parallel/distributed.py turns into the
        # jax.distributed process id). Without it the lone process blocks
        # in jax.distributed.initialize waiting for peers forever.
        cmd = "srun " + cmd
    sbatch_dict["CMD"] = cmd
    print("SRUN Command:  " + cmd)

    content = SBATCH_TEMPLATE.format(**sbatch_dict)
    ofile_dict = dict(OUTDIR=getattr(args, "outdir", "."),
                      JOB_NAME=sbatch_dict["JOB_NAME"])
    if not args.dry_run:
        # unique temp file per submit — a fixed /tmp path races when two
        # jobs are submitted concurrently (each would sbatch the other's
        # script)
        with tempfile.NamedTemporaryFile(
                "w", prefix="ifcbnn_", suffix=".sbatch",
                delete=False) as f:
            f.write(content)
            tmp = f.name
        try:
            resp = subprocess.run(
                ["sbatch", tmp], universal_newlines=True,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        finally:
            os.unlink(tmp)
        if resp.returncode == 0:
            pid = resp.stdout.split()[-1]
            ofile_dict["PID"] = pid
            print("SLURM job_id:  " + pid)
        else:
            print("SLURM job_id:  " + resp.stderr.strip().replace(
                "sbatch: error:", "<sbatch error>"))
            ofile_dict["PID"] = "xxxxxx"
    else:
        ofile_dict["PID"] = "xxxxxx"

    sbatch_ofile = args.ofile.format(**ofile_dict)
    print("SBATCH script: " + sbatch_ofile)
    os.makedirs(os.path.dirname(sbatch_ofile) or ".", exist_ok=True)
    with open(sbatch_ofile, "w") as f:
        f.write(content)


def argparse_sbatch():
    parser = argparse.ArgumentParser(
        prog="ifcbnn-sbatch",
        description="SLURM SBATCH auto-submitter for ifcbnn TRAIN/RUN/VAL")
    slurm = parser.add_argument_group(title="SLURM Args")
    slurm.add_argument("--job-name", metavar="STR")
    slurm.add_argument("--email")
    slurm.add_argument("--walltime", metavar="HH:MM:SS")
    slurm.add_argument("--partition", metavar="NAME",
                       help='Cluster partition; default "tpu"')
    slurm.add_argument("--gres", metavar="SPEC",
                       help='Generic resource request; default "tpu:1"')
    slurm.add_argument("--ntasks", metavar="INT", type=int,
                       help="Tasks (hosts) per job; >1 for multi-host pods")
    slurm.add_argument("--cpu-num", metavar="INT", type=int)
    slurm.add_argument("--mem-per-cpu", metavar="MB", type=int)
    slurm.add_argument("--slurm-log-dir", metavar="DIR")
    slurm.add_argument("--ofile", default="{OUTDIR}/{PID}.{JOB_NAME}.sbatch")
    slurm.add_argument("--conda-env", default="ifcbnn")
    slurm.add_argument("--dry-run", default=False, action="store_true",
                       help="Render the sbatch script without submitting it")
    return parser


def main_cli():
    parser = argparse_sbatch()
    from .cli import argparse_nn
    parser = argparse_nn(parser)
    main(parser)


if __name__ == "__main__":
    main_cli()
