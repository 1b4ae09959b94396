"""Host→device input pipeline: decode, canvas-pack, prefetch.

Replaces the reference's torch DataLoader worker processes doing per-image
PIL decode+resize (/root/reference/neuston_net.py:80-84, neuston_data.py:257-263)
with a TPU-first split of labor:

  host (this module):  decode bytes → uint8, pack variable-size images into a
                       fixed uint8 canvas batch (few ladder sizes → few XLA
                       compilations), overlap with device compute via a
                       bounded prefetch queue and a decode thread pool.
  device (ops/preprocess.py): resize-as-matmul + normalize + flip, fused.

Canvas packing ships raw uint8 over PCIe (3-48x smaller than f32 resized
tensors) and keeps every jit shape static: batches are always `batch_size`
long (short final batches are padded and masked, mirroring the reference's
drop_last=False semantics without a second compile).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

__all__ = ["CANVAS_LADDER", "decode_image", "pack_canvas_batch", "HostLoader",
           "prefetch", "ladder_size"]

# Few static canvas sizes → few compiled preprocess variants. Plankton ROIs
# are typically < 256 px on a side; folder datasets of pre-cropped images too.
CANVAS_LADDER = (64, 128, 256, 512, 1024)
MAX_CANVAS = CANVAS_LADDER[-1]


def ladder_size(max_dim: int) -> int:
    for s in CANVAS_LADDER:
        if max_dim <= s:
            return s
    return MAX_CANVAS


def decode_image(path: str, rgb: bool = True) -> np.ndarray:
    """Decode an image file to uint8 (H,W,3) — the reference's
    `datasets.folder.default_loader` (PIL, .convert('RGB')).

    Fast path: the native GIL-free decoder (native/imgdecode.cpp) for 8-bit
    PNG/JPEG — byte-identical to PIL's convert (pinned by test_native.py)
    and the reason HostLoader's decode THREADS actually scale. PIL handles
    everything the native decoder declines (other formats, 16-bit PNG,
    CMYK JPEG) and the rare oversized image (identical thumbnail rounding
    matters more than decode speed there)."""
    from .. import native
    with open(path, "rb") as f:
        data = f.read()
    # max_dim: the native probe declines oversized images header-only, so
    # the PIL thumbnail path below doesn't pay a discarded full decode
    img = native.decode_bytes_native(data, rgb=rgb, max_dim=MAX_CANVAS)
    if img is not None:
        return img
    from PIL import Image
    import io
    with Image.open(io.BytesIO(data)) as im:
        im = im.convert("RGB" if rgb else "L")
        # Host-downscale only the rare oversized image so canvases stay bounded.
        if max(im.size) > MAX_CANVAS:
            im.thumbnail((MAX_CANVAS, MAX_CANVAS), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


def shrink_to_fit(img: np.ndarray, S: int) -> np.ndarray:
    """Downscale (PIL bilinear, aspect-preserved) so max(h, w) <= S.

    Used for the rare image larger than the canvas ceiling: the whole image
    is KEPT (the reference resizes the full image in one PIL step,
    neuston_data.py:456-464; cropping would silently discard organism
    pixels). The extra resample pass vs the reference's single resize is a
    documented deviation (QUIRKS.md).
    """
    from PIL import Image
    h, w = img.shape[:2]
    scale = S / max(h, w)
    nh = max(1, int(round(h * scale)))
    nw = max(1, int(round(w * scale)))
    return np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR),
                      np.uint8)


def pack_canvas_batch(images, batch_size=None, rgb=None):
    """Pack a list of uint8 arrays (2-D gray or 3-D RGB) into one canvas batch.

    Returns (canvas, sizes, n_valid):
      canvas  uint8 [B, S, S] or [B, S, S, 3]; S = ladder size covering batch
      sizes   int32 [B, 2] true (h, w) per image
      n_valid number of real images (B - n_valid are zero padding rows)
    """
    n = len(images)
    assert n > 0, "empty batch"
    B = batch_size or n
    if rgb is None:
        # any() — not images[0] — so a mixed gray/RGB list whose first
        # entry is grayscale still allocates a 3-channel canvas (gray rows
        # are broadcast below; the reverse would be a broadcast crash)
        rgb = any(img.ndim == 3 for img in images)
    elif not rgb:
        assert all(img.ndim == 2 for img in images), \
            "rgb=False canvas cannot hold 3-D (RGB) images"
    max_dim = max(max(img.shape[0], img.shape[1]) for img in images)
    S = ladder_size(max_dim)
    shape = (B, S, S, 3) if rgb else (B, S, S)
    canvas = np.zeros(shape, dtype=np.uint8)
    sizes = np.ones((B, 2), dtype=np.int32)  # pad rows get size 1x1 (benign)
    for k, img in enumerate(images):
        if rgb and img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        if img.shape[0] > S or img.shape[1] > S:
            img = shrink_to_fit(img, S)  # never crop — see shrink_to_fit
        h, w = img.shape[:2]
        canvas[k, :h, :w] = img
        sizes[k] = (h, w)
    return canvas, sizes, n


class HostLoader:
    """Batched manifest loader with threaded decode and padded static shapes.

    items: list of image paths (decoded via PIL) OR in-memory uint8 arrays
           (ROIs from bins).
    labels: optional int targets parallel to items.

    Yields dicts: canvas uint8[B,S,S(,3)], sizes int32[B,2], labels int32[B],
    mask bool[B] (False on padding rows), indices of the items in this batch.
    """

    def __init__(self, items, labels=None, batch_size=108, num_workers=4,
                 shuffle=False, seed=0, rgb=True, balanced=False,
                 n_real=None, cache=False):
        self.items = list(items)
        self.labels = list(labels) if labels is not None else None
        # items[n_real:] are multi-host manifest pads (shard_manifest):
        # decoded and fed to the model (step-count equality; BatchNorm sees
        # real pixels) but masked out of loss/metrics like batch pads.
        self.n_real = len(self.items) if n_real is None else int(n_real)
        self.batch_size = int(batch_size)
        self.num_workers = max(1, int(num_workers))
        self.shuffle = shuffle
        self.seed = seed
        self.rgb = rgb
        self.balanced = balanced and labels is not None
        # --cache-images: keep decoded uint8 arrays in RAM after the first
        # epoch — the reference re-decodes every image every epoch in its
        # loader workers (neuston_data.py:257-263, the classic input
        # bottleneck); epochs 2+ skip PIL entirely. Opt-in (memory ~ the
        # decoded dataset size). ndarray items (bin ROIs) are already
        # in-memory and bypass the cache.
        self._decoded = {} if cache else None
        self._epoch = 0

    def __len__(self):
        return (len(self.items) + self.batch_size - 1) // self.batch_size

    def _materialize(self, i):
        item = self.items[i]
        if isinstance(item, np.ndarray):
            return item
        if self._decoded is not None:
            img = self._decoded.get(i)
            if img is None:  # races only duplicate a decode, never corrupt
                img = decode_image(item, rgb=self.rgb)
                self._decoded[i] = img
            return img
        return decode_image(item, rgb=self.rgb)

    def __iter__(self):
        rng = np.random.default_rng((self.seed or 0) + self._epoch)
        if self.balanced and self.n_real == 0:
            # an ALL-pads shard (more replica groups than training images —
            # shard_manifest borrowed every row): rng.choice(0, ...) would
            # raise; serve the pad rows in order like the unbalanced path
            # (every row is masked out of loss/metrics anyway)
            order = np.arange(len(self.items))
        elif self.balanced:
            # class-balanced sampling (with replacement, inverse-frequency
            # weights): one "epoch" still draws len(items) samples, but each
            # class contributes ~equally — the BASELINE config #4 sampler the
            # reference lacks (its only lever is --class-max truncation).
            # Draw only from the REAL items: multi-host manifest pads must
            # not inflate class counts nor yield masked-out (wasted) rows.
            labels = np.asarray(self.labels[:self.n_real])
            counts = np.bincount(labels)
            weights = 1.0 / counts[labels]
            order = rng.choice(self.n_real, size=len(self.items),
                               replace=True, p=weights / weights.sum())
        else:
            order = np.arange(len(self.items))
            if self.shuffle:
                rng.shuffle(order)
        self._epoch += 1
        B = self.batch_size
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for start in range(0, len(order), B):
                idx = order[start:start + B]
                images = list(pool.map(self._materialize, idx))
                # pad short batches by CYCLING real images, not zeros:
                # masked rows are excluded from loss/metrics, but BatchNorm
                # statistics see every row — zero images would poison them
                n = len(images)
                while len(images) < B:
                    images.append(images[len(images) % n])
                canvas, sizes, _ = pack_canvas_batch(images, batch_size=B,
                                                     rgb=self.rgb)
                labels = np.zeros(B, dtype=np.int32)
                if self.labels is not None:
                    labels[:n] = [self.labels[i] for i in idx]
                mask = np.zeros(B, dtype=bool)
                mask[:n] = idx < self.n_real
                yield dict(canvas=canvas, sizes=sizes, labels=labels,
                           mask=mask, indices=idx)


def prefetch(iterable, depth: int = 2):
    """Run `iterable` in a background thread, keeping `depth` items ready —
    overlaps host decode/pack with device compute.

    The producer checks a stop event around every blocking put, so if the
    consumer abandons the generator early (exception in the loop body,
    break, GC) the thread exits instead of blocking on a full queue forever
    and leaking decoded canvas batches in a long-lived process."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    err = []
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not _put(item):
                    return
        except BaseException as e:  # surfaced in consumer
            err.append(e)
        finally:
            _put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
