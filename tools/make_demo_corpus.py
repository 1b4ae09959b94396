"""Generate a synthetic demo corpus: a folder-per-class training set and raw
IFCB bins (.adc/.roi/.hdr, both schema generations), so the full TRAIN→RUN
flow can be exercised without instrument data.

    python tools/make_demo_corpus.py /tmp/demo
    python -m ifcb_classifier_tpu TRAIN /tmp/demo/training inception_v3 demo \
        --emax 5 --outdir /tmp/demo/out
    python -m ifcb_classifier_tpu RUN /tmp/demo/bins /tmp/demo/out/demo.ptl run1

Classes are distinguishable by blob morphology (round, elongated, spiky), so
a model genuinely learns — handy for smoke-testing accuracy plumbing.
"""

import argparse
import os

import numpy as np

ADC_V2_COLS = 24
ADC_V1_COLS = 18


def blob(rng, kind, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = h / 2, w / 2
    if kind == "round":
        d = ((yy - cy) / (h / 3)) ** 2 + ((xx - cx) / (w / 3)) ** 2
        img = np.where(d < 1, 210, 60)
    elif kind == "elongated":
        d = ((yy - cy) / (h / 8)) ** 2 + ((xx - cx) / (w / 2.2)) ** 2
        img = np.where(d < 1, 200, 60)
    else:  # spiky
        ang = np.arctan2(yy - cy, xx - cx)
        r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        rim = (h / 4) * (1 + 0.5 * np.sin(6 * ang))
        img = np.where(r < rim, 220, 60)
    img = img + rng.normal(0, 12, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def write_training(root, rng, per_class=60):
    from PIL import Image
    for kind in ("round", "elongated", "spiky"):
        d = os.path.join(root, kind)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            h = int(rng.integers(30, 90))
            w = int(rng.integers(30, 90))
            g = blob(rng, kind, h, w)
            Image.fromarray(np.stack([g] * 3, -1)).save(
                os.path.join(d, f"{kind}_{i:03d}.png"))


def _write_fileset(base, rows, blobdata):
    with open(base + ".adc", "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(base + ".roi", "wb") as f:
        f.write(bytes(blobdata))
    with open(base + ".hdr", "w") as f:
        f.write("softwareVersion: demo\n")


def write_bins(root, rng, n_bins=4, rois_per_bin=120,
               include_v1=True):
    os.makedirs(root, exist_ok=True)
    kinds = ("round", "elongated", "spiky")
    for b in range(n_bins):
        # valid calendar date for any bin count (day 1-28, month rolls over)
        day = b % 28 + 1
        month = (b // 28) % 12 + 1
        pid = f"D2024{month:02d}{day:02d}T120000_IFCB777"
        rows, blobdata = [], bytearray()
        for t in range(rois_per_bin):
            h = int(rng.integers(24, 100))
            w = int(rng.integers(24, 100))
            img = blob(rng, kinds[int(rng.integers(0, 3))], h, w)
            row = ["0"] * ADC_V2_COLS
            row[0] = str(t + 1)
            row[15], row[16], row[17] = str(w), str(h), str(len(blobdata))
            rows.append(",".join(row))
            blobdata.extend(img.tobytes())
        _write_fileset(os.path.join(root, pid), rows, blobdata)

    if not include_v1:
        # homogeneous-v2 corpus for A/B benchmarks: the v1 bin routes
        # through the stitching path in BOTH arms, adding a constant term
        # that dilutes measured speedups (tools/bench_perbin.py)
        return
    # one old-format (schema v1) bin with multi-ROI triggers, so the
    # stitching path gets demo coverage too
    rows, blobdata = [], bytearray()
    for t in range(rois_per_bin // 4):
        trigger = t + 1
        x_off = 0
        for part in range(2):  # two ROIs per trigger -> stitched frame
            h, w = 40, 30
            img = blob(rng, kinds[t % 3], h, w)
            row = ["0"] * ADC_V1_COLS
            row[0] = str(trigger)
            row[9], row[10] = str(x_off), "0"           # roiX, roiY
            row[11], row[12] = str(w), str(h)           # roiWidth, roiHeight
            row[13] = str(len(blobdata))                # startByte
            rows.append(",".join(row))
            blobdata.extend(img.tobytes())
            x_off += w
    _write_fileset(os.path.join(root, "IFCB7_2024_001_120000"),
                   rows, blobdata)


def write_v1_bins(root, rng, n_bins=4, rois_per_bin=40):
    """An ALL-schema-v1 corpus with heterogeneous stitched-frame sizes —
    the legacy-deployment workload that predict_images serves (stitched
    frames bypass the native .roi packer). Mixed trigger widths land the
    frames on several canvas ladders, so this corpus exercises (and
    tools/bench_perbin.py --v1 measures) ladder-major packing: one wide
    stitched frame must not inflate a whole chunk of small ones."""
    os.makedirs(root, exist_ok=True)
    kinds = ("round", "elongated", "spiky")
    for b in range(n_bins):
        rows, blobdata = [], bytearray()
        trigger = 0
        t = 0
        while t < rois_per_bin:
            trigger += 1
            # 1-2 ROIs per trigger; occasional wide pair -> a stitched
            # frame on the 256/512 ladder amid mostly-64-ladder frames
            parts = int(rng.integers(1, 3))
            wide = rng.random() < 0.1
            x_off = 0
            for _p in range(min(parts, rois_per_bin - t)):
                h = int(rng.integers(24, 56))
                w = int(rng.integers(100, 200)) if wide else \
                    int(rng.integers(24, 56))
                img = blob(rng, kinds[t % 3], h, w)
                row = ["0"] * ADC_V1_COLS
                row[0] = str(trigger)
                row[9], row[10] = str(x_off), "0"       # roiX, roiY
                row[11], row[12] = str(w), str(h)       # roiWidth, roiHeight
                row[13] = str(len(blobdata))            # startByte
                rows.append(",".join(row))
                blobdata.extend(img.tobytes())
                x_off += w
                t += 1
        _write_fileset(os.path.join(root, f"IFCB7_2024_{b + 1:03d}_120000"),
                       rows, blobdata)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dest")
    ap.add_argument("--per-class", type=int, default=60)
    ap.add_argument("--bins", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    write_training(os.path.join(args.dest, "training"), rng, args.per_class)
    write_bins(os.path.join(args.dest, "bins"), rng, args.bins)
    print(f"demo corpus at {args.dest}: training/ (3 classes x "
          f"{args.per_class}) + bins/ ({args.bins} bins)")


if __name__ == "__main__":
    main()
