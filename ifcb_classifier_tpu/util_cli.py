"""Auxiliary task CLI — the reference's neuston_util.py
(/root/reference/neuston_util.py:135-165): MAKE_DATASET_CONFIG,
MAKE_CLASS_CONFIG, CALC_IMG_NORM; plus PORT_WEIGHTS (torch state_dict →
ifcbnn checkpoint-ready weights, replacing torchvision's download role).
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np


def write_csv(outfile, rows):
    """CSV to file or stdout (neuston_util.py:56-63)."""
    if outfile:
        with open(outfile, "w", newline="") as f:
            csv.writer(f).writerows(rows)
    else:
        for row in rows:
            print(",".join(str(c) for c in row))


def make_dataset_config(args):
    """Union of class subdirs across datasets → priority-headered CSV
    (neuston_util.py:66-97)."""
    datasets, priorities = [], []
    for src in args.dataset:
        parts = src.split(":", 1)
        if len(parts) == 2:
            datasets.append(parts[1])
            priorities.append(int(parts[0]))
        else:
            datasets.append(parts[0])
            priorities.append(0)
    priorities = [p if p > 0 else max(priorities) + 1 for p in priorities]

    classes = set()
    dataset_subdirs = []
    for dataset in datasets:
        subdirs = [d for d in os.listdir(dataset)
                   if os.path.isdir(os.path.join(dataset, d))]
        dataset_subdirs.append(subdirs)
        classes.update(subdirs)

    header = [""] + ["{}:{}".format(p, d) for p, d in zip(priorities, datasets)]
    rows = [[cls] + ["1" if cls in dssd else "0" for dssd in dataset_subdirs]
            for cls in sorted(classes)]
    write_csv(args.outfile, [header] + rows)


def make_class_config(args):
    """Class list → (class,'1') CSV (neuston_util.py:101-121)."""
    if os.path.isdir(args.dataset):
        classes = [d for d in os.listdir(args.dataset)
                   if os.path.isdir(os.path.join(args.dataset, d))]
    elif os.path.isfile(args.dataset) and args.dataset.endswith(".csv"):
        with open(args.dataset) as f:
            reader = csv.reader(f)
            next(reader)
            rows = list(reader)
        classes = [r[0] for r in rows if any(v != "0" for v in r[1:])]
    else:
        raise ValueError(f'Dataset is invalid: "{args.dataset}"')
    classes.sort()
    write_csv(args.outfile, [[args.dataset, "CONFIG1"]] +
              [[c, "1"] for c in classes])


def calc_img_norm(args):
    """Dataset channel mean/std: mean of per-batch channel means/stds —
    the reference's approximate population stats (neuston_util.py:13-54),
    but computed on-device through the canvas pipeline instead of a torch
    DataLoader."""
    import jax
    import jax.numpy as jnp

    from .data.datasets import scan_dataset
    from .data.pipeline import HostLoader, prefetch
    from .ops.preprocess import preprocess_batch

    nd = scan_dataset(args)  # the shared flag→dataset mapping

    loader = HostLoader(nd.images, nd.targets, batch_size=args.batch_size,
                        num_workers=4, shuffle=False)

    @jax.jit
    def batch_stats(canvas, sizes, mask):
        # per-batch JOINT mean/std over all valid pixels (np.std(batch,
        # axis=(0,2,3)) in the reference, neuston_util.py:35-36) — NOT the
        # mean of per-image stds, which by the law of total variance omits
        # inter-image mean variance and underestimates STD
        x = preprocess_batch(canvas, sizes, out_size=args.resize)
        m = mask.astype(jnp.float32)[:, None, None, None]
        n_pix = jnp.maximum(m.sum() * x.shape[1] * x.shape[2], 1.0)
        cm = (x * m).sum(axis=(0, 1, 2)) / n_pix
        cv = (((x - cm) ** 2) * m).sum(axis=(0, 1, 2)) / n_pix
        return cm, jnp.sqrt(cv)

    pop_mean, pop_std = [], []
    num_batches = len(loader)
    for i, b in enumerate(prefetch(iter(loader)), 1):
        cm, cs = batch_stats(b["canvas"], b["sizes"], jnp.asarray(b["mask"]))
        pop_mean.append(np.asarray(cm))
        pop_std.append(np.asarray(cs))
        if i % 100 == 0:
            print("\n{:.1f}% ({}/{} images) mean={} std={}".format(
                100 * i / num_batches, i, num_batches,
                np.array(pop_mean).mean(axis=0)[0],
                np.array(pop_std).mean(axis=0)[0]))
        else:
            print(".", end="", flush=True)
    print()
    return np.array(pop_mean).mean(axis=0), np.array(pop_std).mean(axis=0)


def port_weights(args):
    """Both porting directions, auto-detected from the input format:

    * torch state_dict (.pth / Lightning .ptl zip / .npz) → .npz of
      torch-keyed numpy arrays usable by TRAIN --weights
      (models/torch_port.py) — torchvision's download role.
    * OUR msgpack checkpoint → torchvision-keyed torch .pth
      (models/torch_port.py export_state_dict), handing trained weights
      back to torch/torchvision users."""
    with open(args.STATE_DICT, "rb") as f:
        head = f.read(2)
    # torch artifacts: zip ('PK', torch>=1.6) OR legacy pickle stream
    # (0x80 + protocol byte, torch<1.6 / _use_new_zipfile_serialization=
    # False) — both are handled by torch.load. Our msgpack checkpoint's
    # payload dict serializes as a msgpack fixmap (0x84), never a pickle
    # magic, so the sniff is unambiguous.
    # len(head) == 2 guard: a 1-byte truncated file starting 0x80 would
    # otherwise sniff as a torch pickle (b'' is "in" any bytes) and die
    # later inside torch.load with a far less helpful error
    is_torch_or_npz = (head == b"PK"
                       or (len(head) == 2 and head[:1] == b"\x80"
                           and head[1:2] in b"\x02\x03\x04\x05")
                       or args.STATE_DICT.endswith(".npz"))
    if not is_torch_or_npz:
        # not a zip (torch/npz): our msgpack checkpoint — reverse port
        from .models.torch_port import export_state_dict
        from .train.checkpoint import load_checkpoint
        params, stats, hparams = load_checkpoint(args.STATE_DICT)
        sd = export_state_dict(hparams["MODEL"], params, stats)
        out = args.outfile or (os.path.splitext(args.STATE_DICT)[0] + ".pth")
        import torch
        # .copy(): export_state_dict returns transposed (non-writable)
        # views; torch.from_numpy on those warns about undefined behavior
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v).copy())
                    for k, v in sd.items()}, out)
        print("PORTED {} tensors (checkpoint -> torch state_dict) -> {}"
              .format(len(sd), out))
        return
    from .models.torch_port import _load_state_dict
    sd = _load_state_dict(args.STATE_DICT)
    out = args.outfile or (os.path.splitext(args.STATE_DICT)[0] + ".npz")
    np.savez(out, **sd)
    print("PORTED {} tensors -> {}".format(len(sd), out))


def main(args):
    if args.cmd == "MAKE_DATASET_CONFIG":
        make_dataset_config(args)
    elif args.cmd == "MAKE_CLASS_CONFIG":
        make_class_config(args)
    elif args.cmd == "CALC_IMG_NORM":
        print("Computing dataset image-normalization mean/std...")
        mean, std = calc_img_norm(args)
        print("mean={} std={}".format(mean, std))
    elif args.cmd == "PORT_WEIGHTS":
        port_weights(args)


def argparse_util():
    parser = argparse.ArgumentParser(prog="ifcbnn-util")
    sub = parser.add_subparsers(dest="cmd",
                                help="Pick exactly one sub-command.")

    dc = sub.add_parser("MAKE_DATASET_CONFIG",
                        help="Write a starter dataset-combining config csv.")
    dc.add_argument("dataset", metavar="PATH", nargs="+",
                    help='Dataset paths, optionally prefixed "n:" with an '
                         "integer priority (lower = higher priority).")
    dc.add_argument("-o", "--outfile", help="Output file; default stdout.")

    cc = sub.add_parser("MAKE_CLASS_CONFIG",
                        help="Write a starter class-config csv for a dataset.")
    cc.add_argument("dataset", metavar="PATH",
                    help="dataset directory or dataset-config csv.")
    cc.add_argument("-o", "--outfile", help="Output file; default stdout.")

    im = sub.add_parser("CALC_IMG_NORM",
                        help="Calculate dataset MEAN/STD for image normalizing")
    im.add_argument("SRC")
    im.add_argument("--resize", metavar="N", default=299, type=int,
                    choices=[224, 299], help="Resize edge used during the scan; 299 (inception_v3 default) or 224")
    im.add_argument("--class-config", metavar=("CSV", "COL"), nargs=2)
    im.add_argument("--class-min", metavar="MIN", default=2, type=int)
    im.add_argument("--class-max", metavar="MAX", default=None, type=int)
    im.add_argument("--batch-size", metavar="B", default=108, type=int)

    pw = sub.add_parser("PORT_WEIGHTS",
                        help="Convert a torch state_dict .pth to .npz for "
                             "TRAIN --weights — or, given one of OUR "
                             "checkpoints, the reverse: a torchvision-"
                             "keyed .pth for torch users")
    pw.add_argument("STATE_DICT")
    pw.add_argument("-o", "--outfile")
    return parser


def main_cli(argv=None):
    args = argparse_util().parse_args(argv)
    main(args)


if __name__ == "__main__":
    main_cli()
