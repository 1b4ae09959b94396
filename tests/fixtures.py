"""Synthetic IFCB bin + image-folder fixtures (SURVEY.md §4 test plan)."""

import os

import numpy as np


def write_bin(dirpath, pid, rois, schema=2, trigger_of=None):
    """Write a synthetic .adc/.roi/.hdr triplet.

    rois: list of 2-D uint8 arrays (or None for an image-less ADC row).
    trigger_of: optional list mapping roi index -> trigger number (schema-1
    stitching tests); default: one trigger per row.
    Returns the fileset basepath.
    """
    from ifcb_classifier_tpu.data.ifcb import ADC_COLUMNS_V1, ADC_COLUMNS_V2

    os.makedirs(dirpath, exist_ok=True)
    base = os.path.join(dirpath, pid)
    columns = ADC_COLUMNS_V1 if schema == 1 else ADC_COLUMNS_V2
    col_idx = {c: i for i, c in enumerate(columns)}

    roi_bytes = bytearray()
    adc_lines = []
    offset = 0
    for k, roi in enumerate(rois):
        row = [0] * len(columns)
        row[col_idx["trigger"]] = trigger_of[k] if trigger_of else k + 1
        if roi is not None:
            h, w = roi.shape
            row[col_idx["roiWidth"]] = w
            row[col_idx["roiHeight"]] = h
            row[col_idx["startByte"]] = offset
            if trigger_of:  # place side by side within a trigger frame
                prev = [i for i in range(k) if trigger_of[i] == trigger_of[k]]
                row[col_idx["roiX"]] = sum(rois[i].shape[1] for i in prev)
                row[col_idx["roiY"]] = 0
            roi_bytes.extend(roi.tobytes())
            offset += h * w
        adc_lines.append(",".join(str(v) for v in row))

    with open(base + ".adc", "w") as f:
        f.write("\n".join(adc_lines) + "\n")
    with open(base + ".roi", "wb") as f:
        f.write(bytes(roi_bytes))
    with open(base + ".hdr", "w") as f:
        f.write("softwareVersion: test\nbinaryVersion: {}\n".format(schema))
    return base


def make_roi(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def write_image_folder_dataset(root, classes_counts, size=(40, 30), seed=0):
    """Folder-per-class PNG dataset. classes_counts: {class_name: n_images}."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    for cls, n in classes_counts.items():
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            arr = rng.integers(0, 256, size=(size[0], size[1], 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{cls}_{i:03d}.png"))
    return root
