"""The RUN orchestrator — replaces the reference's `do_run`
(/root/reference/neuston_net.py:163-308).

Structural upgrade over the reference (SURVEY.md §3.2): the reference spins up
a full Lightning `trainer.test()` per bin (neuston_net.py:266) unless --gobig;
here ONE jit-compiled predict function persists across all bins (a handful of
compiles total, one per canvas-ladder size), ROIs stream through the
canvas-pack pipeline, and per-bin output files + per-bin error isolation are
preserved exactly.

Behavior parity checklist:
  * checkpoint hparams recover classes/resize/img_norm/seed    neuston_net.py:173-174
  * IN/OUT keyword filter, keywords or keyword-files           neuston_net.py:199-207,236-240
  * DataDirectory / .txt bin list / single bin                 neuston_net.py:211-228
  * namespace from subdir path                                 neuston_net.py:234
  * skip-if-output-exists unless --clobber                     neuston_net.py:242-251
  * empty-bin → error list; per-bin exception trapping;
    end-of-run error report                                    neuston_net.py:257-259,266-268,275-278
  * schema-v1 stitching                                        neuston_data.py:446-449
  * img mode: recursive walk/.txt/single + one dataset         neuston_net.py:282-308
"""

from __future__ import annotations

import os
import time
import zlib

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import list_image_paths, parse_imgnorm
from ..data.ifcb import SCHEMA_VERSION_1, DataDirectory, infilled_images
from ..data.pipeline import HostLoader, pack_canvas_batch, prefetch
from ..models import get_namebrand_model
from ..results.run import save_run_results
from ..train.checkpoint import load_checkpoint
from ..train.state import make_predict_step


def _batch_buckets(batch_size, align=1, enabled=True):
    """Halving ladder of dispatch batch sizes, floor 16, each rounded up to
    a multiple of `align` (the engine's data-mesh axis — sharded dispatch
    needs the batch divisible by it). batch_size=256 → (16,32,64,128,256);
    batch_size≤16 or enabled=False degenerate to the single full batch."""
    if not enabled or batch_size <= 16:
        return (batch_size,)
    buckets = {batch_size}
    b = batch_size
    while True:
        b = -(-b // 2)
        b = -(-b // align) * align
        if b < 16 or b in buckets:
            break
        buckets.add(b)
    return tuple(sorted(buckets))


class InferenceEngine:
    """Persistent jit predict pipeline: canvas batch → probs."""

    def __init__(self, ckpt_path, batch_size=108, dtype=None, fold=None,
                 mesh=None, quant=False, calib_batches=1, batch_ladder=None,
                 calib_src=None, calib_count=128):
        params, batch_stats, hparams = load_checkpoint(ckpt_path)
        self.hparams = hparams
        self.classes = hparams["classes"]
        self.resize = hparams["resize"]
        # migrated .ptl checkpoints may lack model_id: fall back to the
        # checkpoint basename — the SAME fallback sbatch.py applies at
        # submit time, so the {MODEL_ID} outdir a job renders at runtime
        # matches where its SLURM logs/archived script landed (a None here
        # also crashed the .h5/.mat writers after classification)
        self.model_id = hparams.get("model_id") or \
            os.path.splitext(os.path.basename(ckpt_path))[0]
        # `or 0`, not get(..., 0): migrated .ptl checkpoints materialize
        # seed=None (the key EXISTS), and random.seed(None) downstream
        # would seed from OS entropy — nondeterministic runs despite the
        # parity intent
        self.seed = hparams.get("seed") if hparams.get("seed") is not None \
            else 0
        self.img_norm = hparams.get("img_norm")
        self.batch_size = batch_size
        if dtype is None:
            dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

        # eval-time BN→conv folding (models/fold.py): exact algebra on the
        # frozen running stats, applied once at engine build. Default on for
        # supported families; fold=False (or IFCBNN_NO_FOLD=1) disables for
        # A/B debugging. Score deltas vs unfolded are float-rounding-level
        # (pinned ≤1e-3 in tests/test_fold.py).
        from ..models.fold import fold_params, supports_fold
        if fold is None:
            fold = (supports_fold(hparams["MODEL"])
                    and os.environ.get("IFCBNN_NO_FOLD") != "1")
        self.folded = bool(fold)
        if self.folded:
            params, batch_stats = fold_params(hparams["MODEL"], params,
                                              batch_stats)

        # --precision int8 (models/quant.py): calibrated lazily on the first
        # `calib_batches` batches this engine sees (activation scales need
        # real data). With the default calib_batches=1 every score —
        # including that first batch's — comes from the int8 graph; with
        # N>1 the absmax accumulates over the first N batches, which are
        # served by the full-precision folded graph (strictly more accurate)
        # before the engine swaps to int8. Requires the folded graph
        # (quantization of the BN-merged conv weights).
        self.quant = bool(quant)
        self.calib_batches = max(1, int(calib_batches))
        self.calib_src = calib_src
        self._quant_ready = False
        self._calib_fn = None
        self._calib_absmax = None
        self._calib_seen = 0
        if calib_src and not self.quant:
            raise ValueError("--calib is only meaningful with "
                             "--precision int8 (it pins the int8 "
                             "activation scales)")
        if calib_src and int(calib_batches) > 1:
            raise ValueError("--calib pins activation scales to a fixed "
                             "sample; --calib-batches widens FIRST-ARRIVAL "
                             "calibration — pick one")
        if self.quant:
            from ..models.quant import supports_quant
            if not supports_quant(hparams["MODEL"]):
                raise ValueError(
                    f"--precision int8 is not supported for "
                    f"{hparams['MODEL']!r} (families: inception_v3, "
                    "resnet*, vgg*_bn — depthwise/grouped convs gain "
                    "nothing from the int8 MXU path)")
            if not self.folded:
                raise ValueError("--precision int8 requires BN folding "
                                 "(unset IFCBNN_NO_FOLD)")

        # pretrained must round-trip from the checkpoint: torchvision's
        # inception_v3(pretrained=True) forces transform_input=True — a MODEL
        # attribute that applies at inference too (the reference serves it
        # via the Lightning checkpoint). Rebuilding with pretrained=False
        # would silently drop the channel renorm for pretrained inceptions.
        model = get_namebrand_model(hparams["MODEL"], len(self.classes),
                                    pretrained=bool(hparams.get("pretrained")),
                                    dtype=dtype, fold_bn=self.folded)
        self.model = model
        self._mean_std = (parse_imgnorm(self.img_norm) if self.img_norm
                          else (None, None))

        # multi-device: shard the canvas batch over 'data'; `mesh`
        # ("DATA[xMODEL]", the --mesh surface) optionally also shards the
        # classifier-head kernels over 'model' (TP; parallel/mesh.py rules) —
        # the v5e-pod deployment shape (BASELINE config #5). LOCAL devices
        # only: in the multi-host fleet each bin is classified entirely by
        # one process (do_run shards BINS across processes), so the engine's
        # data parallelism must not span hosts — a global mesh here rejects
        # the host-local numpy batches outright (caught by
        # tests/test_multiprocess.py). Single chip degenerates to plain jit.
        local = jax.local_devices()
        from ..utils.config import parse_mesh
        # --mesh is GLOBAL (same spec as TRAIN — one launch script can pass
        # one value to both commands); the engine is host-local by design
        # (bins shard across hosts), so the data axis splits evenly across
        # processes to give this host's mesh
        n_proc = jax.process_count()
        n_data, n_model = parse_mesh(mesh, len(local) * n_proc)
        if n_proc > 1:
            if n_data % n_proc:
                raise ValueError(
                    f"--mesh {n_data}x{n_model}: the data axis must be a "
                    f"multiple of the process count ({n_proc}) in "
                    "multi-host runs")
            n_data //= n_proc
        self._mesh_shape = (n_data, n_model)
        if len(local) > 1 and self.batch_size % n_data:
            self.batch_size = -(-self.batch_size // n_data) * n_data

        # batch-bucket ladder: each dispatch pads its chunk to the SMALLEST
        # bucket that covers it instead of always the full batch. The
        # reference pays a full Trainer batch per bin regardless of bin size
        # (neuston_net.py:266); without this, a 40-ROI bin at batch 256
        # wastes 84% of its MXU slots on pad rows unless the user opts into
        # --gobig. Buckets compile lazily (only shapes actually seen pay a
        # compile); IFCBNN_NO_BATCH_LADDER=1 or batch_ladder=False restores
        # single-shape dispatch for A/B debugging.
        if batch_ladder is None:
            batch_ladder = os.environ.get("IFCBNN_NO_BATCH_LADDER") != "1"
        self.batch_buckets = _batch_buckets(
            self.batch_size, n_data if len(local) > 1 else 1, batch_ladder)
        self.params, self.batch_stats, self._run_batch = \
            self._place_and_jit(params, batch_stats, make_predict_step(model))
        if self.quant and calib_src:
            self._calibrate_pinned(calib_src, calib_count)

    def _calibrate_pinned(self, calib_src, calib_count):
        """RUN --precision int8 --calib DIR: freeze activation scales to a
        fixed calibration sample at engine build, instead of whichever bin
        happens to arrive first (VERDICT r4 weak #4: two operationally
        identical services could otherwise disagree at the ~1e-2 score
        level forever). Shares EXPORT's calib loader (export.py
        _load_calib_batch — bins or image folders, stitched v1 composites
        included) so a RUN pinned to DIR and an EXPORT --calib DIR
        artifact score identically. The engine is int8-ready before the
        first dispatch; every score it ever returns uses these scales."""
        from ..export import _load_calib_batch
        from ..models.quant import make_calib_fn
        mean, std = self._mean_std
        x = _load_calib_batch(calib_src, self.resize, mean, std,
                              int(calib_count))
        calib_fn, geoms = make_calib_fn(self.model)
        absmax = {k: float(v) for k, v in jax.device_get(
            jax.jit(calib_fn)(self.params, self.batch_stats,
                              jnp.asarray(x))).items()}
        self._calib_absmax = absmax
        self._swap_to_quant(absmax, geoms)

    def _swap_to_quant(self, absmax, geoms):
        """Quantize the folded weights against `absmax` and swap the
        engine onto the int8 program — the ONE swap sequence shared by
        pinned (--calib) and lazy (first-arrival) calibration, so a
        placement/donation change can never apply to one path only."""
        from ..models.quant import make_quant_predict, quantize_params
        pruned, qconv = quantize_params(jax.device_get(self.params), geoms)
        pruned["__quant__"] = qconv
        predict_q = make_quant_predict(self.model, absmax, geoms)
        self.params, self.batch_stats, self._run_batch = self._place_and_jit(
            pruned, jax.device_get(self.batch_stats), predict_q)
        self._quant_ready = True

    @classmethod
    def from_args(cls, args):
        """Build the engine from a RUN argparse namespace — the ONE mapping
        from CLI flags to constructor kwargs, shared by cli.main_cli and
        do_run (they drifted when each carried its own copy: a knob added to
        one site was silently dropped by the other).

        --precision is honored here: auto = bf16 on TPU (measured score
        deltas vs fp32 quantified in QUIRKS.md / test_bf16_infer.py), fp32 =
        reference-exact inference at ~1/3 TPU throughput, int8 = the
        quantized speed tier (models/quant.py; elementwise stays at the
        backend default dtype)."""
        from ..utils.config import resolve_dtype
        precision = getattr(args, "precision", None)
        cb = getattr(args, "calib_batches", None)
        if cb is not None and cb < 1:
            # explicit nonsense must fail fast, not be silently
            # reinterpreted as 1 by the falsy-zero `or 1` below
            raise ValueError(f"--calib-batches must be >= 1 (got {cb})")
        return cls(
            args.MODEL, batch_size=args.batch_size,
            dtype=resolve_dtype(None if precision == "int8" else precision),
            mesh=getattr(args, "mesh", None),
            quant=precision == "int8",
            calib_batches=getattr(args, "calib_batches", None) or 1,
            batch_ladder=getattr(args, "batch_ladder", None),
            calib_src=getattr(args, "calib", None),
            calib_count=getattr(args, "calib_count", None) or 128)

    def bucket_for(self, n):
        """Smallest dispatch batch covering n rows (pad-waste control)."""
        for b in self.batch_buckets:
            if b >= n:
                return b
        return self.batch_size

    def _preprocess(self, canvas, sizes):
        from ..ops.preprocess import preprocess_batch
        mean, std = self._mean_std
        return preprocess_batch(canvas, sizes, out_size=self.resize,
                                mean=mean, std=std, dtype=jnp.float32)

    def _place_and_jit(self, params, batch_stats, predict):
        """device_put the (params, batch_stats) trees per the engine mesh and
        jit the canvas->probs program around `predict`. Shared by the
        bf16/fp32 build and the post-calibration int8 rebuild (whose pruned
        params tree carries the int8 leaves under '__quant__' — replicated
        like everything non-head by parallel/mesh.py rules)."""

        def run_batch_fn(params, batch_stats, canvas, sizes):
            return predict(params, batch_stats,
                           self._preprocess(canvas, sizes))

        local = jax.local_devices()
        if len(local) > 1:
            import jax.tree_util as jtu
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import make_mesh, params_shardings
            n_data, n_model = self._mesh_shape
            dev_mesh = make_mesh(n_data=n_data, n_model=n_model,
                                 devices=local)
            rep = NamedSharding(dev_mesh, P())
            shard = NamedSharding(dev_mesh, P("data"))
            psh = params_shardings(params, dev_mesh)
            ssh = jtu.tree_map(lambda _: rep, batch_stats)
            params = jax.device_put(params, psh)
            batch_stats = jax.device_put(batch_stats, ssh)
            run = jax.jit(run_batch_fn,
                          in_shardings=(psh, ssh, shard, shard),
                          out_shardings=rep)
        else:
            params = jax.device_put(params)
            batch_stats = jax.device_put(batch_stats)
            run = jax.jit(run_batch_fn)
        return params, batch_stats, run

    def _dispatch(self, canvas, sizes):
        """All inference routes through here: on the first `calib_batches`
        batches of an int8 engine, calibrate activation scales from THIS
        data; once enough batches are seen, swap in the quantized program
        (with the default calib_batches=1 the swap happens before the first
        dispatch, so every score the engine ever returns comes from one
        graph; a run shorter than calib_batches simply stays at full
        precision)."""
        if self.quant and not self._quant_ready:
            # pad calibration-phase dispatches to the FULL batch shape: with
            # the batch-bucket ladder on, calib batches could otherwise
            # arrive at several bucket shapes, each costing a throwaway
            # compile of BOTH the capture pass and the interim
            # full-precision graph (abandoned at the int8 swap). One fixed
            # shape keeps the single-compile guarantee; extra rows are
            # pad rows (benign for absmax — buckets carry pads anyway) and
            # callers slice probs by their own row counts.
            if canvas.shape[0] < self.batch_size:
                pad = self.batch_size - canvas.shape[0]
                canvas = np.concatenate(
                    [canvas, np.zeros((pad,) + canvas.shape[1:],
                                      canvas.dtype)], axis=0)
                sizes = np.concatenate(
                    [sizes, np.ones((pad, 2), sizes.dtype)], axis=0)
            if self.calib_batches > 1:
                # contract (cli --calib-batches help, QUIRKS.md): ALL N
                # calibration batches are served by the full-precision
                # graph; the int8 swap takes effect on the NEXT dispatch.
                # Without capturing the pre-swap program here, batch N
                # itself would come from the just-swapped int8 graph.
                fp = (self._run_batch, self.params, self.batch_stats)
                self._calibrate(canvas, sizes)
                run, params, stats = fp
                return run(params, stats, canvas, sizes)
            self._calibrate(canvas, sizes)  # N=1: swap BEFORE the first
            # dispatch — every score the engine ever returns is int8
        return self._run_batch(self.params, self.batch_stats, canvas, sizes)

    def _calibrate(self, canvas, sizes):
        """Accumulate per-tensor activation absmax over this batch; on the
        calib_batches-th batch, quantize and swap in the int8 program."""
        from ..models.quant import make_calib_fn
        if self._calib_fn is None:
            calib_fn, self._calib_geoms = make_calib_fn(self.model)

            def calib_batch(params, batch_stats, canvas, sizes):
                return calib_fn(params, batch_stats,
                                self._preprocess(canvas, sizes))

            # jit once and keep it: N>1 must not recompile the capture pass
            self._calib_fn = jax.jit(calib_batch)
        absmax = self._calib_fn(self.params, self.batch_stats, canvas, sizes)
        absmax = {k: float(v) for k, v in jax.device_get(absmax).items()}
        if self._calib_absmax is None:
            self._calib_absmax = absmax
        else:
            self._calib_absmax = {k: max(v, self._calib_absmax[k])
                                  for k, v in absmax.items()}
        self._calib_seen += 1
        if self._calib_seen < self.calib_batches:
            return  # keep serving full precision while calibrating
        self._swap_to_quant(self._calib_absmax, self._calib_geoms)

    def predict_images(self, images):
        """images: list of uint8 arrays (2-D gray ROIs or 3-D RGB).
        Returns [N, n_classes] float32 softmax scores in input order.

        LADDER-MAJOR packing (like predict_bin's native-packer path):
        images are grouped by canvas ladder size BEFORE chunking, so one
        1024-ladder image cannot inflate a whole chunk of small ROIs —
        schema-v1 stitched bins and oversized ROIs are served exclusively
        through here, so legacy-bin deployments would otherwise pay the
        inflation on every mixed chunk (reference analog: the per-bin
        loader's uniform resize, neuston_data.py:446-464, has no such
        hazard because it never batches mixed canvas sizes).

        Dispatches all chunks asynchronously and fetches once at the end, so
        host→device transfer of chunk k+1 overlaps compute of chunk k."""
        if not images:
            return np.zeros((0, len(self.classes)), np.float32)
        from ..data.pipeline import ladder_size
        B = self.batch_size
        rgb = any(img.ndim == 3 for img in images)
        ladders = np.asarray(
            [ladder_size(int(max(img.shape[0], img.shape[1])))
             for img in images])
        out = np.zeros((len(images), len(self.classes)), np.float32)
        pending = []  # (device probs, original row indices)
        for S in np.unique(ladders):
            idx = np.nonzero(ladders == S)[0]
            for c0 in range(0, idx.size, B):
                sel = idx[c0:c0 + B]
                canvas, sizes, _n = pack_canvas_batch(
                    [images[j] for j in sel],
                    batch_size=self.bucket_for(sel.size), rgb=rgb)
                pending.append((self._dispatch(canvas, sizes), sel))
        for probs, sel in zip(jax.device_get([p for p, _ in pending]),
                              [s for _, s in pending]):
            out[sel] = probs[:sel.size]
        return out

    def predict_bin(self, bin):
        """Fast path for schema-v2 bins: ROIs are packed straight from the
        .roi byte buffer into canvas batches by the native C++ packer
        (native/roipack.cpp) — no per-image Python objects at all. Schema-v1
        bins (needing stitching) use the generic path.

        Returns (targets, probs) aligned, targets in ascending order.
        """
        from ..data.pipeline import ladder_size

        if bin.schema == SCHEMA_VERSION_1:
            images_dict = infilled_images(bin)
            if not images_dict:
                return [], np.zeros((0, len(self.classes)), np.float32)
            targets = list(images_dict.keys())
            return targets, self.predict_images(list(images_dict.values()))

        from .. import native
        adc = bin.adc
        keep = np.nonzero((adc["roiWidth"] > 0) & (adc["roiHeight"] > 0))[0]
        if keep.size == 0:
            return [], np.zeros((0, len(self.classes)), np.float32)
        heights = adc["roiHeight"][keep].astype(np.int64)
        widths = adc["roiWidth"][keep].astype(np.int64)
        starts = adc["startByte"][keep].astype(np.int64)
        roi_buf = bin._roi_bytes
        err = _roi_bounds_error(roi_buf, keep, heights, widths, starts)
        if err is not None:  # BEFORE any slicing (gobig add_bin parity)
            raise err

        big_rows, keep, heights, widths, starts = _split_oversized(
            self.predict_images, roi_buf, keep, heights, widths, starts)
        targets = keep + 1
        if keep.size == 0:
            ordered = sorted(big_rows)
            return ordered, np.stack([big_rows[t] for t in ordered])
        ladders = np.asarray([ladder_size(int(max(h, w)))
                              for h, w in zip(heights, widths)])

        B = self.batch_size
        pending = []  # (device probs, sel) — fetched once at bin end so the
        # next chunk's pack+transfer overlaps this chunk's compute
        for S in np.unique(ladders):
            idx = np.nonzero(ladders == S)[0]
            for c0 in range(0, idx.size, B):
                sel = idx[c0:c0 + B]
                canvas, sizes = native.pack_rois_native(
                    roi_buf, starts[sel], heights[sel], widths[sel],
                    batch_size=self.bucket_for(sel.size), canvas_size=int(S))
                # packer marks out-of-bounds ROIs (truncated .roi) as (0,0):
                # fail the whole bin so it lands in the error report instead
                # of silently classifying garbage pixels
                bad = np.nonzero(sizes[:len(sel), 0] == 0)[0]
                if bad.size:
                    raise ValueError(
                        "corrupt bin: ROI byte range out of bounds for "
                        "target(s) {}".format(
                            [int(targets[sel[j]]) for j in bad[:5]]))
                pending.append((self._dispatch(canvas, sizes), sel))
        probs_by_target = dict(big_rows)
        for probs, sel in zip(jax.device_get([p for p, _ in pending]),
                              [s for _, s in pending]):
            for k, j in enumerate(sel):
                probs_by_target[int(targets[j])] = probs[k]
        ordered = sorted(probs_by_target)
        return ordered, np.stack([probs_by_target[t] for t in ordered])

    def gobig(self, on_result, on_error, inflight_depth=4):
        """Cross-bin batch aggregation — the real implementation of the
        reference's --gobig (neuston_net.py:261-271, which aggregated all
        bins into one Trainer run to amortize setup). Here the win is pad
        elimination: per-bin batches pad each ladder bucket up to the batch
        size, so small bins waste MXU slots; the aggregator packs ROIs from
        MANY bins into shared full batches and only pads once, at the final
        flush. Per-bin output files and per-bin error isolation are kept:
        results are routed back per ROI and a bin completes (on_result)
        when its last ROI returns."""
        return _GobigAggregator(self, on_result, on_error, inflight_depth)

    def predict_loader(self, loader):
        """Stream a HostLoader (image paths) through the engine; returns
        (probs [N,C], paths in traversal order). Async dispatch, one fetch.

        The final short batch rides the batch-bucket ladder too: HostLoader
        pads to the full batch by cycling real images (a TRAIN requirement —
        BatchNorm), but pad rows are always the TAIL rows, so slicing the
        canvas down to the smallest covering bucket drops only pads."""
        pending, ns, paths = [], [], []
        for b in prefetch(iter(loader)):
            n = int(b["mask"].sum())
            bb = self.bucket_for(n)
            pending.append(self._dispatch(b["canvas"][:bb], b["sizes"][:bb]))
            ns.append(n)
            paths.extend(loader.items[i] for i in b["indices"][:n])
        fetched = jax.device_get(pending)
        return (np.concatenate([p[:n] for p, n in zip(fetched, ns)], axis=0),
                paths)


def _roi_bounds_error(roi_buf, keep, heights, widths, starts):
    """Whole-bin ROI byte-range validation, shared by predict_bin and the
    gobig aggregator so the two cannot drift (same rationale as
    _split_oversized): returns a ValueError to raise/report, or None.
    Catches negative startByte (would wrap via Python negative indexing and
    silently classify wrong bytes) and out-of-range ends (truncated .roi).
    Overflow-safe like the native packer (roipack.cpp): h*w near 2^32 wraps
    int64 and would bypass a naive `s + h*w > size` check."""
    size = np.int64(roi_buf.size)
    wpos = np.maximum(widths, 1)
    bad = np.nonzero((heights <= 0) | (widths <= 0) | (starts < 0) |
                     (starts > size) |
                     (heights > (size - starts) // wpos))[0]
    if bad.size:
        return ValueError(
            "corrupt bin: ROI byte range out of bounds for target(s) "
            "{}".format([int(keep[j] + 1) for j in bad[:5]]))
    return None


def _split_oversized(predict_images, roi_buf, keep, heights, widths, starts):
    """Split out ROIs whose max side exceeds the canvas ceiling and classify
    them via the generic shrink-to-fit path (the native packer would CROP
    them; reference parity — the full image is always classified,
    neuston_data.py:456-464). Returns ({target: probs_row} for the oversized
    ones, and the filtered keep/heights/widths/starts for the native path).
    Shared by predict_bin and the gobig aggregator so the two cannot drift.
    """
    from ..data.pipeline import MAX_CANVAS

    big = np.maximum(heights, widths) > MAX_CANVAS
    if not big.any():
        return {}, keep, heights, widths, starts
    bsel = np.nonzero(big)[0]
    imgs = [roi_buf[int(starts[j]):int(starts[j]) +
                    int(heights[j]) * int(widths[j])]
            .reshape(int(heights[j]), int(widths[j]))
            for j in bsel]
    bprobs = predict_images(imgs)
    big_rows = {int(keep[j] + 1): bprobs[k] for k, j in enumerate(bsel)}
    norm = np.nonzero(~big)[0]
    return (big_rows, keep[norm], heights[norm], widths[norm], starts[norm])


class _GobigAggregator:
    """Cross-bin canvas packing for InferenceEngine.gobig().

    ROI descriptors queue per ladder-bucket size; a bucket dispatches as a
    FULL batch the moment it fills (no pad rows except the end-of-run
    flush). Corrupt bins (ROI byte ranges out of bounds) are rejected whole
    at add_bin time, before anything is enqueued, preserving predict_bin's
    fail-the-whole-bin semantics. Completion order is arbitrary — a bin's
    on_result fires when its last ROI's batch returns."""

    def __init__(self, engine, on_result, on_error, inflight_depth=4):
        self.engine = engine
        self.on_result = on_result
        self.on_error = on_error
        self.depth = max(1, inflight_depth)
        self.queues = {}    # S -> list of (key, target, roi_buf, s0, h, w)
        self.bins = {}      # key -> dict(obj, remaining, rows{target: probs})
        self.inflight = []  # (device_probs, [(key, target), ...])
        self._next_key = 0

    def add_bin(self, bin, bin_obj):
        from ..data.pipeline import ladder_size

        if bin.schema == SCHEMA_VERSION_1:
            # legacy stitched bins: classify immediately via the generic path
            images_dict = infilled_images(bin)
            if not images_dict:
                self.on_error(bin_obj, AssertionError("Bin is Empty"))
                return
            targets = list(images_dict.keys())
            probs = self.engine.predict_images(list(images_dict.values()))
            self.on_result(bin_obj, targets, probs)
            return

        adc = bin.adc
        keep = np.nonzero((adc["roiWidth"] > 0) & (adc["roiHeight"] > 0))[0]
        if keep.size == 0:
            self.on_error(bin_obj, AssertionError("Bin is Empty"))
            return
        heights = adc["roiHeight"][keep].astype(np.int64)
        widths = adc["roiWidth"][keep].astype(np.int64)
        starts = adc["startByte"][keep].astype(np.int64)
        roi_buf = bin._roi_bytes
        # whole-bin bounds check BEFORE enqueueing, covering every condition
        # the packer flags as (0,0) (predict_bin parity: a truncated/corrupt
        # bin fails loudly as a whole, never classifies garbage)
        err = _roi_bounds_error(roi_buf, keep, heights, widths, starts)
        if err is not None:
            self.on_error(bin_obj, err)
            return

        big_rows, keep, heights, widths, starts = _split_oversized(
            self.engine.predict_images, roi_buf, keep, heights, widths,
            starts)
        if keep.size == 0:  # bin was ALL oversized — complete immediately
            ordered = sorted(big_rows)
            self.on_result(bin_obj, ordered,
                           np.stack([big_rows[t] for t in ordered]))
            return

        # COMPACT copy: queued rows must pin only THEIR pixels. Enqueuing
        # views of bin._roi_bytes kept each bin's ENTIRE .roi buffer alive
        # until its last queued row dispatched — up to ~(ladders x
        # batch_size) distinct bins' full buffers concurrently on mixed
        # archives. One sequential copy of the kept ranges bounds resident
        # memory to the queued pixels; fragment grouping in _dispatch_inner
        # (same-buffer runs) is preserved because the whole bin shares this
        # one compact buffer.
        lens = heights * widths
        new_starts = np.zeros(keep.size, np.int64)
        np.cumsum(lens[:-1], out=new_starts[1:])
        compact = np.empty(int(lens.sum()), np.uint8)
        for i in range(keep.size):
            s = int(starts[i])
            d = int(new_starts[i])
            compact[d:d + int(lens[i])] = roi_buf[s:s + int(lens[i])]
        roi_buf, starts = compact, new_starts

        key = self._next_key
        self._next_key += 1
        self.bins[key] = dict(obj=bin_obj, remaining=int(keep.size),
                              rows=big_rows)
        for i in range(keep.size):
            S = ladder_size(int(max(heights[i], widths[i])))
            self.queues.setdefault(S, []).append(
                (key, int(keep[i] + 1), roi_buf,
                 int(starts[i]), int(heights[i]), int(widths[i])))
            q = self.queues[S]
            if len(q) >= self.engine.batch_size:
                batch_items = q[:self.engine.batch_size]
                # consume BEFORE dispatching: a failed dispatch must not
                # leave a poisoned head that every later add_bin retries
                self.queues[S] = q[self.engine.batch_size:]
                self._dispatch(S, batch_items)

    def _dispatch(self, S, items):
        """Pack `items` (<= batch_size) into one canvas batch and dispatch.
        Packing runs per same-buffer fragment through the native packer,
        then fragments concatenate; the tail pads with 1x1 rows (eval mode
        — pad rows are sliced off before routing, BN stats never update).

        A SYNCHRONOUS failure (packer tripwire, compile/OOM on a new bucket
        shape) is contained like _drain_one's poisoned fetch: every bin
        with rows in THIS batch gets its own error record; the error never
        propagates to whichever unrelated bin happened to trigger the
        batch fill. Rows of a dropped bin still queued elsewhere route to
        a dead key and are skipped on drain."""
        try:
            self._dispatch_inner(S, items)
        except Exception as e:
            for key in {it[0] for it in items}:
                b = self.bins.pop(key, None)
                if b is not None:
                    self.on_error(b["obj"], e)

    def _dispatch_inner(self, S, items):
        from .. import native

        B = self.engine.bucket_for(len(items))
        frags, meta = [], []
        i = 0
        while i < len(items):
            j = i
            buf = items[i][2]
            while j < len(items) and items[j][2] is buf:
                j += 1
            frag = items[i:j]
            canvas, sizes = native.pack_rois_native(
                buf,
                np.asarray([f[3] for f in frag], np.int64),
                np.asarray([f[4] for f in frag], np.int64),
                np.asarray([f[5] for f in frag], np.int64),
                batch_size=len(frag), canvas_size=int(S))
            frags.append((canvas, sizes))
            meta.extend((f[0], f[1]) for f in frag)
            i = j
        canvas = np.concatenate([c for c, _ in frags], axis=0)
        sizes = np.concatenate([s for _, s in frags], axis=0)
        if not (sizes[:len(items), 0] > 0).all():  # tripwire: add_bin
            # validated every packer failure condition, so this is an
            # invariant breach — fail loudly, never classify zeroed rows
            raise RuntimeError("gobig: packer flagged ROI(s) that passed "
                               "validation — refusing to classify")
        # final flush pads to the smallest covering bucket. Tradeoff: on a
        # COLD compile cache this can add one compile per (bucket, canvas)
        # shape at end of run vs reusing the already-compiled full batch —
        # minutes over the dev tunnel, amortized away by the persistent
        # compile cache and by watch-mode services (which flush every pass
        # and reuse the bucket shapes for the process lifetime). The win is
        # the small-bin regime where flush dispatches dominate (measured
        # 2.74x, tools/bench_perbin.py); IFCBNN_NO_BATCH_LADDER=1 restores
        # full-batch-only shapes.
        if len(items) < B:
            canvas = np.concatenate(
                [canvas, np.zeros((B - len(items), S, S), np.uint8)], axis=0)
            sizes = np.concatenate(
                [sizes, np.ones((B - len(items), 2), np.int32)], axis=0)
        self.inflight.append((self.engine._dispatch(canvas, sizes), meta))
        if len(self.inflight) > self.depth:
            self._drain_one()

    def _drain_one(self):
        probs, meta = self.inflight[0]
        try:
            probs = jax.device_get(probs)
        except Exception as e:
            # poisoned batch (async XLA error, tunnel hiccup): per-bin error
            # isolation must survive it — every bin with rows in THIS batch
            # gets its own error record and is dropped; sibling batches keep
            # draining. Popping before the fetch would lose the bins
            # silently and trip flush's completeness assert instead.
            self.inflight.pop(0)
            for key in {k for k, _ in meta}:
                b = self.bins.pop(key, None)
                if b is not None:
                    self.on_error(b["obj"], e)
            return
        self.inflight.pop(0)
        for row, (key, target) in zip(probs, meta):
            b = self.bins.get(key)
            if b is None:  # bin already errored out of an earlier batch
                continue
            b["rows"][target] = row
            b["remaining"] -= 1
            if b["remaining"] == 0:
                del self.bins[key]
                ordered = sorted(b["rows"])
                # contain on_result failures (a bad output path, a full
                # disk) to THIS bin: sibling rows in the same batch keep
                # routing and the run keeps its per-bin error isolation
                try:
                    self.on_result(b["obj"], ordered,
                                   np.stack([b["rows"][t] for t in ordered]))
                except Exception as e:
                    self.on_error(b["obj"], e)

    def flush(self):
        """Dispatch all partial buckets and drain every in-flight batch."""
        for S, q in sorted(self.queues.items()):
            for c0 in range(0, len(q), self.engine.batch_size):
                self._dispatch(S, q[c0:c0 + self.engine.batch_size])
        self.queues = {}
        while self.inflight:
            self._drain_one()
        assert not self.bins, "gobig: bins left incomplete after flush"


def _bin_fmt(bin_obj):
    """The outfile/plot templating fields for one bin (neuston_callbacks.py:180-184)."""
    return dict(BIN_ID=bin_obj.pid, BIN_YEAR=bin_obj.year,
                BIN_DATE=bin_obj.yearday, INPUT_SUBDIRS=bin_obj.namespace)


def parse_filter(filter_arg):
    """IN/OUT + keywords or keyword-files (neuston_net.py:199-207).

    The mode is validated loudly: the reference instantiates an
    ArgumentTypeError without raising it (neuston_net.py:166-170), so a
    typo like `--filter in ...` silently classified EVERY bin (QUIRKS.md,
    FIXED)."""
    if not filter_arg:
        return None, []
    mode = filter_arg[0]
    if mode not in ("IN", "OUT"):
        raise ValueError('--filter mode must be "IN" or "OUT" (got {!r})'
                         .format(mode))
    keywords = []
    for keyword in filter_arg[1:]:
        if os.path.isfile(keyword):
            # strip + drop blank lines: the reference extended raw
            # splitlines(), so one trailing newline yielded keyword '' which
            # substring-matches EVERY pid (IN: filter no-op; OUT: whole
            # dataset skipped) — QUIRKS.md, FIXED
            with open(keyword) as f:
                keywords.extend(k for k in
                                (line.strip() for line in f) if k)
        else:
            keywords.append(keyword)
    if not keywords:
        # the reference instantiated (never raised) this check too
        # (neuston_net.py:168-170) — a bare `--filter IN` would silently
        # classify zero bins here ("IN nothing" matches nothing)
        raise ValueError("--filter {} needs at least one KEYWORD "
                         "(or a non-empty keyword file)".format(mode))
    return mode, keywords


def do_run(args, engine=None):
    if engine is None:
        engine = InferenceEngine.from_args(args)
    import random as _random
    _random.seed(engine.seed)

    if os.path.isdir(args.SRC) and not args.SRC.endswith(os.sep):
        args.SRC = args.SRC + os.sep

    if not args.outfile:
        if args.src_type == "bin":
            args.outfile = ["D{BIN_YEAR}/D{BIN_DATE}/{BIN_ID}_class.h5"]
        if args.src_type == "img":
            args.outfile = ["img_results.json"]
    # fail fast on a typo'd --outfile placeholder/extension — the same
    # front-loading --results and --plot get; discovering it at the first
    # write would lose hours of inference
    from ..results.run import validate_outfiles
    validate_outfiles(args.outfile, src_type=args.src_type)

    filter_mode, filter_keywords = parse_filter(args.filter)

    # --plot (the reference's reserved-but-TODO surface, neuston_net.py:413):
    # bin-templated FNAMEs render per bin; plain FNAMEs render one aggregate
    # figure at end of run. Params and pattern/mode combinations are
    # validated HERE, before any compute — render-time discovery would
    # surface hours into a run.
    plot_files = getattr(args, "plot_files", None) or []
    perbin_plots = [pf for pf in plot_files
                    if "{BIN_" in pf[0] or "{INPUT_SUBDIRS}" in pf[0]]
    agg_plots = [pf for pf in plot_files if pf not in perbin_plots]
    # --summary: machine-readable run summary (the aggregate plot's JSON
    # twin for pipeline/monitoring integration); refreshed per watch pass
    summary_file = getattr(args, "summary", None)
    track_agg = bool(plot_files or summary_file)
    if plot_files:
        from ..results.plots import save_run_plots, validate_plot_files
        validate_plot_files(plot_files, which="run", src_type=args.src_type)
    if track_agg:
        from ..results.plots import SCORE_HIST_BINS
        # O(1)-memory aggregate accumulators (a --watch service runs for
        # months; per-ROI lists would grow without bound)
        agg_counts = np.zeros(len(engine.classes), np.int64)
        agg_hist = np.zeros(SCORE_HIST_BINS, np.int64)
    agg_total = 0
    n_errors_total = 0

    def rank_suffixed(fname):
        """Per-process output name in a multi-host fleet: each process only
        sees its own bin shard, so hosts must not clobber one shared file
        (last-writer-wins would under-report counts and hide errors).
        img mode is exempt: it runs on process 0 ONLY (single-file output
        contract), so a suffix would just hide the documented filename from
        monitoring consumers."""
        if jax.process_count() == 1 or args.src_type == "img":
            return fname
        stem, ext = os.path.splitext(fname)
        return "{}.r{}{}".format(stem, jax.process_index(), ext)

    def write_summary(n_done, error_bins, n_images=None):
        if not summary_file:
            return
        import json as _json
        path = os.path.join(args.outdir, rank_suffixed(summary_file))
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = dict(
            version="v3", run_id=args.RUN_ID, model_id=engine.model_id,
            timestamp=args.cmd_timestamp, updated_at=time.time(),
            # src_type disambiguates the schema: img-mode runs have no bins,
            # so n_bins_done=0 there means "not applicable", and n_images
            # carries the actual work count (VERDICT r2 weak#6)
            src_type=args.src_type, n_images=n_images,
            n_bins_done=n_done, n_rois=int(agg_total),
            class_counts={c: int(n) for c, n in
                          zip(engine.classes, agg_counts)},
            score_histogram=dict(bins=len(agg_hist), range=[0, 1],
                                 counts=[int(x) for x in agg_hist]),
            n_errors=n_errors_total,
            errors=[dict(bin=str(b), type=type(e).__name__, message=str(e))
                    for b, e in error_bins[-100:]])  # most RECENT
        tmp = path + ".tmp"
        with open(tmp, "w") as f:  # atomic swap: watch consumers may poll
            _json.dump(payload, f, indent=1)
        os.replace(tmp, path)

    # --watch flag sanity is mode-independent: reject silently-ignored and
    # silently-disabled spellings up front
    watch = getattr(args, "watch", None)
    if watch is not None and watch <= 0:
        raise ValueError("--watch must be a positive number of seconds")
    if watch and args.src_type != "bin":
        raise ValueError("--watch requires --type bin")
    if getattr(args, "watch_settle", None) is not None and not watch:
        raise ValueError("--watch-settle requires --watch (it is the "
                         "quiescence window between watch passes)")
    if (getattr(args, "calib_batches", None) not in (None, 1)
            and getattr(args, "precision", None) != "int8"):
        raise ValueError("--calib-batches requires --precision int8 "
                         "(it sizes the int8 calibration phase)")

    if args.src_type == "bin":
        # --watch: continuous serving mode (beyond-reference; the reference's
        # deployment story is batch SLURM jobs, neuston_sbatch.py). The
        # persistent jit engine classifies new bins as the instrument writes
        # them; skip-existing semantics make each pass idempotent.
        if watch and getattr(args, "clobber", False):
            raise ValueError("--watch and --clobber are mutually exclusive "
                             "(clobber would reclassify every bin each pass)")
        if watch and not os.path.isdir(args.SRC):
            raise ValueError("--watch requires SRC to be a bin directory")
        # quiescence window: a bin whose files changed within the last
        # `settle` seconds may still be mid-acquisition — defer it
        ws = getattr(args, "watch_settle", None)
        settle = float(ws if ws is not None else (watch or 0))

        def make_dd():
            """(Re)scan SRC — per pass under --watch so new bins appear."""
            if os.path.isdir(args.SRC):
                wl = filter_keywords if filter_mode == "IN" else None
                bl = filter_keywords if filter_mode == "OUT" else None
                return DataDirectory(args.SRC, whitelist=wl, blacklist=bl)
            if os.path.isfile(args.SRC) and args.SRC.endswith(".txt"):
                with open(args.SRC) as f:
                    bins = [b.strip() for b in f.read().splitlines()
                            if b.strip()]
                if not bins:  # a raise, not an assert: python -O must
                    # not turn an empty list into a silent 0-bin success
                    raise ValueError(f"{args.SRC}: bin list is empty")
                # direct per-entry resolution (no tree walk): each listed
                # basepath/.adc path is stat'd, and a missing or invalid
                # entry raises NAMING it — never a silent 0-bin run, never
                # a recursive scan of a large data root just to find the
                # handful of listed bins
                return DataDirectory.from_basepaths(bins)
            # single bin: same direct resolution — a typo'd pid or a
            # missing .adc/.roi fileset raises naming the path instead of
            # printing 'RUN IS DONE (0 bins)' with exit 0
            return DataDirectory.from_basepaths([args.SRC])

        # multi-host fleet: each process takes every P-th bin — the job-level
        # fan-out the reference delegated to SLURM submission
        # (neuston_sbatch.py), here built in (SURVEY.md §2.3 comm backend row)
        # No exception guard here: a failed process_index/count would mean a
        # half-initialized jax.distributed, and silently degrading to
        # proc_cnt=1 would make EVERY host classify EVERY bin (duplicate
        # outputs) — fail loudly instead.
        proc_idx, proc_cnt = jax.process_index(), jax.process_count()

        error_bins = []   # most recent MAX_ERRORS only (bounded for --watch)
        MAX_ERRORS = 200
        n_done = 0
        session_done = 0  # bins classified by THIS process run — n_done
        # can resume >0 from the watch-state sidecar, which would
        # otherwise keep --profile's start gate from ever firing
        # --watch staleness self-heal reclassifies grown bins; without
        # per-bin bookkeeping every reclassification would double-count the
        # bin's ROIs in the aggregate plots/summary and bump n_done again.
        # O(#bins) memory, same order as the directory scan itself.
        done_pids = set()
        bin_contrib = {}  # pid str -> (counts, hist, n_rois) last added
        # failed bins retry with exponential backoff (in passes) instead of
        # being frozen for the session — a transient NFS hiccup in a months-
        # long --watch service must not become a permanent data gap, while a
        # permanently corrupt bin must not hot-loop every pass
        fail_retry = {}  # pid str -> (n_fails, earliest retry pass)
        pass_no = 0
        # staleness EVICTION: per-bin bookkeeping for pids absent from the
        # directory for EVICT_AFTER consecutive scans is dropped (and its
        # aggregate contribution subtracted), so a months-long --watch on a
        # ROTATING directory stays O(live bins), not O(service history).
        # The aggregate summary therefore tracks the live directory — the
        # same semantics the reclassification self-heal already chose. A
        # pid deleted and later re-added counts as newly classified.
        EVICT_AFTER = 3
        absent_count = {}  # pid str -> consecutive scans missing

        # RESTART RESUME (watch + tracked aggregate): bin_contrib is the one
        # piece of state that cannot be rebuilt from the output files without
        # re-running the model, so it is persisted after every pass to a
        # sidecar in the outdir and reloaded on service start. Without it, a
        # restarted `--watch --summary` service would reclassify EVERY
        # fresh-output bin just to repopulate the live aggregate — unbounded
        # recompute on a large archive. Bins missing from the sidecar (first
        # deploy, corrupt/version-skewed file, model change) still fall back
        # to reclassification, which stays correct, just slower.
        state_path = os.path.join(args.outdir,
                                  rank_suffixed(".watch_state.json"))
        # dirty-flag: the sidecar is rewritten only when a contribution
        # actually changed — idle passes over a static directory touch
        # nothing (the steady-state soak test pins outputs byte-stable)
        _ws_dirty = [False]

        def save_watch_state():
            if not (watch and track_agg):
                return
            if not (_ws_dirty[0]
                    or (bin_contrib and not os.path.isfile(state_path))):
                return
            _ws_dirty[0] = False
            import json as _json
            payload = dict(
                version=1, model_id=engine.model_id,
                classes=list(engine.classes), hist_bins=len(agg_hist),
                contrib={k: [c.tolist(), h.tolist(), int(n)]
                         for k, (c, h, n) in bin_contrib.items()})
            os.makedirs(args.outdir, exist_ok=True)
            tmp = state_path + ".tmp"
            with open(tmp, "w") as f:  # atomic: a mid-write crash must not
                _json.dump(payload, f)  # leave a truncated sidecar behind
            os.replace(tmp, state_path)

        def load_watch_state():
            nonlocal agg_total, agg_counts, agg_hist, n_done
            if not (watch and track_agg and os.path.isfile(state_path)):
                return
            import json as _json
            try:
                with open(state_path) as f:
                    st = _json.load(f)
                if (st.get("version") != 1
                        or st.get("model_id") != engine.model_id
                        or st.get("classes") != list(engine.classes)
                        or st.get("hist_bins") != len(agg_hist)):
                    return  # schema/model changed: rebuild by reclassifying
                for k, entry in st["contrib"].items():
                    if (proc_cnt > 1
                            and zlib.crc32(str(k).encode()) % proc_cnt
                            != proc_idx):
                        # fleet RESIZED between restarts: this bin's
                        # pid-hash now maps to another rank. Resuming it
                        # here would double-count its ROIs fleet-wide (the
                        # new owner reclassifies it into ITS aggregate)
                        # and this rank's copy could never update or evict
                        # (the shard check skips non-owned bins while they
                        # remain on disk). Dirty-flag so the on-disk
                        # sidecar converges to the filtered view this pass
                        # instead of re-resuming the stale entries forever.
                        _ws_dirty[0] = True
                        continue
                    c, h, n = entry
                    c, h = np.asarray(c, np.int64), np.asarray(h, np.int64)
                    if (c.shape != agg_counts.shape
                            or h.shape != agg_hist.shape):
                        continue
                    bin_contrib[k] = (c, h, int(n))
                    done_pids.add(k)
                    agg_counts += c
                    agg_hist += h
                    agg_total += int(n)
                n_done = len(done_pids)
                if bin_contrib:
                    print("Resumed watch aggregate from {} ({} bins)".format(
                        state_path, len(bin_contrib)), flush=True)
            except (ValueError, KeyError, TypeError, OSError):
                pass  # corrupt sidecar: fall back to reclassification

        def evict_stale(seen_pids):
            """Returns the number of bins evicted this pass (the caller
            refreshes aggregate plots when nonzero — an eviction-only
            pass used to leave the plot at pre-eviction totals while the
            summary already showed the reduced counts)."""
            nonlocal agg_total, agg_counts, agg_hist, n_done
            n_evicted = 0
            tracked = (done_pids | set(bin_contrib) | set(fail_retry)
                       | set(absent_count))
            for key in tracked:
                if key in seen_pids:
                    absent_count.pop(key, None)
                    continue
                n = absent_count.get(key, 0) + 1
                if n < EVICT_AFTER:
                    absent_count[key] = n
                    continue
                if key in done_pids:
                    # keep n_done == len(done_pids): without this, a bin
                    # deleted and later re-added counted TWICE (eviction
                    # removed it from done_pids so reclassification took
                    # the not-reclass branch), inflating n_bins_done until
                    # a restart snapped it back down
                    done_pids.discard(key)
                    n_done -= 1
                fail_retry.pop(key, None)
                absent_count.pop(key, None)
                n_evicted += 1
                contrib = bin_contrib.pop(key, None)
                if contrib is not None and track_agg:
                    pc, ph, pn = contrib
                    agg_counts -= pc
                    agg_hist -= ph
                    agg_total -= pn
                    _ws_dirty[0] = True
            return n_evicted

        def record_error(bin_obj, e):
            nonlocal n_errors_total
            n_errors_total += 1
            error_bins.append((bin_obj, e))
            if len(error_bins) > MAX_ERRORS:  # bounded: a run-forever
                del error_bins[0]             # service must stay O(1) memory
            n = fail_retry.get(str(bin_obj), (0, 0))[0] + 1
            backoff = min(2 ** n, 64)
            fail_retry[str(bin_obj)] = (n, pass_no + backoff)
            if watch:  # surface immediately — exit-time reports don't exist
                # for a service that never exits
                print("\n{} FAILED ({}: {}) — retry in {} pass(es)".format(
                    bin_obj, type(e).__name__, e, backoff), flush=True)

        # --profile N: jax.profiler trace of the first N classified bins
        # (SURVEY.md §5.1 — observability on the deployment path too)
        profile_bins = int(getattr(args, "profile", 0) or 0)
        profiling = False

        def maybe_profile():
            nonlocal profile_bins, profiling
            if profile_bins and not profiling and session_done == 0:
                jax.profiler.start_trace(os.path.join(args.outdir, "profile"))
                profiling = True
            elif profiling and session_done >= profile_bins:
                jax.profiler.stop_trace()
                profiling = False
                profile_bins = 0

        def bin_shard_key(bin_no, bin_obj):
            """Which process owns this bin. Enumeration order is stable for a
            fixed directory (reference-parity single-pass behavior); under
            --watch new arrivals shift indices between passes, so ownership
            must come from the pid itself to stay stable across rescans."""
            if watch:
                return zlib.crc32(str(bin_obj.pid).encode()) % proc_cnt
            return bin_no % proc_cnt

        def run_pass():
            """One sweep over SRC; returns number of bins newly classified."""
            nonlocal n_done
            if watch and not os.path.isdir(args.SRC):
                # transient SRC disappearance (NFS/mount flap): SRC was
                # validated as a directory at startup, so a missing dir
                # here is an infrastructure hiccup. Falling through would
                # hit make_dd's single-bin branch and raise (killing the
                # service), and an "empty" pass would advance eviction
                # bookkeeping toward dropping EVERY bin's contribution.
                # Skip the whole pass — including eviction — and retry on
                # the next one.
                print("\nwatch: SRC {} is not a directory this pass "
                      "(mount flap?) — skipping pass".format(args.SRC),
                      flush=True)
                return 0
            new_done = 0
            seen_pids = set()  # every pid on disk this pass (pre-filter)

            def emit_result(bin_obj, targets, probs):
                """Write files/plots for one completed bin (called directly
                on the per-bin path, or by the gobig aggregator whenever a
                bin's last ROI returns)."""
                nonlocal n_done, session_done, new_done, \
                    agg_total, agg_counts, agg_hist
                input_images = [bin_obj.with_target(t) for t in targets]
                for outfile in args.outfile:
                    save_run_results(input_images, probs, engine.classes,
                                     args.cmd_timestamp, args.outdir,
                                     outfile, engine.model_id, bin_obj)
                pid_key = str(bin_obj)
                reclass = pid_key in done_pids
                done_pids.add(pid_key)
                # success closes the failure incident: the NEXT transient
                # error on this bin starts backoff at 2 passes again instead
                # of escalating cumulatively over the service lifetime
                fail_retry.pop(pid_key, None)
                if track_agg:
                    cls = np.argmax(probs, axis=1)
                    win = np.max(probs, axis=1)
                    fmt = _bin_fmt(bin_obj)
                    for fname, *plot_params in perbin_plots:
                        save_run_plots(
                            os.path.join(args.outdir, fname).format(**fmt)
                            .replace(2 * os.sep, os.sep), plot_params,
                            class_labels=engine.classes,
                            output_classes=cls, winscores=win,
                            title=str(bin_obj.pid))
                    from ..results.plots import SCORE_HIST_BINS
                    counts = np.bincount(cls, minlength=len(engine.classes))
                    hist = np.histogram(
                        win, bins=SCORE_HIST_BINS, range=(0, 1))[0]
                    if pid_key in bin_contrib:  # self-heal: replace, not add
                        pc, ph, pn = bin_contrib[pid_key]
                        agg_counts -= pc
                        agg_hist -= ph
                        agg_total -= pn
                    agg_counts += counts
                    agg_hist += hist
                    agg_total += len(cls)
                    bin_contrib[pid_key] = (counts, hist, len(cls))
                    _ws_dirty[0] = True
                if not reclass:
                    n_done += 1
                session_done += 1
                new_done += 1
                maybe_profile()
                print(".", end="", flush=True)

            # --gobig: cross-bin batch aggregation (neuston_net.py:261-271
            # role) — small bins stop wasting pad slots; files/errors stay
            # per-bin via the callbacks
            agg = (engine.gobig(emit_result, record_error)
                   if getattr(args, "gobig", False) else None)

            for bin_no, bin in enumerate(make_dd()):
                # namespace = bin's subdirs under SRC. PREFIX-anchored
                # strip (reference quirk FIXED, QUIRKS.md): the reference's
                # `.replace(args.SRC, '')` (neuston_net.py:234) removes
                # EVERY occurrence, so a tree like SRC=/data with a bin at
                # /data/ifcb/data/D2021/... collapsed the namespace and
                # {INPUT_SUBDIRS} outputs landed in a wrong directory.
                bp = bin.fileset.basepath
                rel = os.path.dirname(
                    bp[len(args.SRC):] if bp.startswith(args.SRC) else bp)
                bin.pid.namespace = rel + os.sep if rel else ""
                bin_obj = bin.pid
                seen_pids.add(str(bin_obj))
                if proc_cnt > 1 and bin_shard_key(bin_no, bin_obj) != proc_idx:
                    continue
                fr = fail_retry.get(str(bin_obj))
                if fr and pass_no < fr[1]:  # failed earlier; still backing off
                    continue

                if args.filter:  # keyword filter on the pid (neuston_net.py:236-240)
                    if filter_mode == "IN" and not any(
                            k in str(bin_obj) for k in filter_keywords):
                        continue
                    if filter_mode == "OUT" and any(
                            k in str(bin_obj) for k in filter_keywords):
                        continue

                try:
                    newest = 0.0
                    if watch:
                        # quiescence gate: the instrument writes
                        # .adc/.roi/.hdr incrementally — don't classify a
                        # bin still being written; defer until its files
                        # have been stable for a full settle window
                        # (--watch-settle, default the watch interval). A
                        # bin misjudged complete still self-heals: the
                        # staleness check below reclassifies it once it
                        # grows past its outputs.
                        newest = max((os.path.getmtime(p) for p in
                                      (bin.adc_path, bin.roi_path,
                                       bin.hdr_path)
                                      if os.path.isfile(p)), default=0)
                        if time.time() - newest < settle:
                            continue

                    if not args.clobber:
                        fmt = _bin_fmt(bin_obj)
                        ofiles = [os.path.join(args.outdir, o).format(**fmt)
                                  .replace(2 * os.sep, os.sep)
                                  for o in args.outfile]
                        if all(os.path.isfile(o) for o in ofiles):
                            if not watch:
                                print("{} result-file(s) already exist - "
                                      "skipping this bin".format(bin_obj))
                                continue
                            # watch: outputs older than the bin's newest
                            # file mean the bin GREW after classification
                            # (writes resumed post-settle) — reclassify;
                            # fresh outputs skip as usual. EXCEPT when the
                            # aggregate is tracked and this pid has no live
                            # contribution: skipping would leave its ROIs
                            # permanently missing from the live aggregate,
                            # so it is reclassified like a new bin. This is
                            # the fallback path only — on a service restart
                            # contributions are resumed from the
                            # .watch_state.json sidecar (load_watch_state),
                            # so it fires just for bins the sidecar missed
                            # (pre-sidecar outputs, eviction + re-add,
                            # crash between emit and the pass-end save).
                            if min(os.path.getmtime(o)
                                   for o in ofiles) >= newest:
                                if (not track_agg
                                        or str(bin_obj) in bin_contrib):
                                    continue
                except OSError as e:
                    # TOCTOU: a file deleted/renamed between isfile() and
                    # getmtime() (instrument rotation, NFS hiccup) is a
                    # per-bin incident with backoff retry — it must never
                    # kill a months-long watch service
                    record_error(bin_obj, e)
                    continue

                try:
                    maybe_profile()
                    if agg is not None:
                        agg.add_bin(bin, bin_obj)
                        continue
                    targets, probs = engine.predict_bin(bin)
                    if not targets:
                        record_error(bin_obj, AssertionError("Bin is Empty"))
                        continue
                    emit_result(bin_obj, targets, probs)
                except Exception as e:  # per-bin isolation (neuston_net.py:266-268)
                    record_error(bin_obj, e)
            if agg is not None:
                try:
                    agg.flush()
                except Exception as e:  # systemic, not per-bin — record once
                    record_error("<gobig flush>", e)
            n_evicted = 0
            if watch:
                n_evicted = evict_stale(seen_pids)
            # nonzero ALSO for eviction-only passes: the aggregate changed,
            # so the watch loop must refresh the plots too
            return new_done + n_evicted

        def refresh_agg_plots():
            if agg_plots and agg_total:
                for fname, *plot_params in agg_plots:
                    save_run_plots(
                        os.path.join(args.outdir, rank_suffixed(fname)),
                        plot_params,
                        class_labels=engine.classes, counts=agg_counts,
                        score_hist=agg_hist, total=agg_total,
                        title="{} ({} bins)".format(args.RUN_ID, n_done))

        if not watch:
            run_pass()
            refresh_agg_plots()
            write_summary(n_done, error_bins)
        else:
            max_passes = getattr(args, "watch_passes", None)  # test hook
            load_watch_state()  # restart: resume the aggregate from disk
            print("Watching {} every {:g}s (Ctrl-C to stop)".format(
                args.SRC, watch), flush=True)
            try:
                while True:
                    if run_pass():
                        refresh_agg_plots()
                    write_summary(n_done, error_bins)
                    save_watch_state()
                    pass_no += 1
                    if max_passes and pass_no >= max_passes:
                        break
                    time.sleep(watch)
            except KeyboardInterrupt:
                print("\nwatch stopped")

        if profiling:  # fewer bins than N — close the trace cleanly
            jax.profiler.stop_trace()
        print("\nRUN IS DONE ({} bins)".format(n_done))
        if error_bins:
            print("Bins that errored and produced no output:")
            if n_errors_total > len(error_bins):
                print("  (showing the most recent {} of {} failures)".format(
                    len(error_bins), n_errors_total))
            for bin_obj, err in error_bins:
                print(bin_obj, type(err), err)

    else:  # IMAGES
        # img mode emits ONE un-suffixed result file (reference contract,
        # neuston_callbacks.py:186-202) — in a multi-host fleet only process
        # 0 runs it; N hosts would do N× duplicate inference then race-write
        # the same path (bin mode is the sharded fleet workload)
        if jax.process_count() > 1 and jax.process_index() != 0:
            print("RUN --type img is single-file output: classified by "
                  "process 0 only; idle on this host")
            return
        img_paths = list_image_paths(args.SRC, filter_mode, filter_keywords)
        if not img_paths:  # raise, not assert (python -O strips asserts)
            raise ValueError(f"No images to process under {args.SRC}")
        # engine.batch_size, NOT args.batch_size: the engine rounds its
        # batch up to a multiple of the local device count — a loader batch
        # of the raw size would violate the jit's 'data' in_sharding
        loader = HostLoader(img_paths, batch_size=engine.batch_size,
                            num_workers=args.loaders, rgb=True)
        import contextlib
        ctx = (jax.profiler.trace(os.path.join(args.outdir, "profile"))
               if int(getattr(args, "profile", 0) or 0)
               else contextlib.nullcontext())
        with ctx:
            probs, paths = engine.predict_loader(loader)
        for outfile in args.outfile:
            save_run_results(paths, probs, engine.classes, args.cmd_timestamp,
                             args.outdir, outfile, engine.model_id, args.SRC)
        for fname, *plot_params in agg_plots:
            save_run_plots(os.path.join(args.outdir, fname), plot_params,
                           class_labels=engine.classes,
                           output_classes=np.argmax(probs, axis=1),
                           winscores=np.max(probs, axis=1),
                           title="{} ({} images)".format(args.RUN_ID,
                                                         len(paths)))
        if track_agg:
            from ..results.plots import SCORE_HIST_BINS
            cls = np.argmax(probs, axis=1)
            agg_counts += np.bincount(cls, minlength=len(engine.classes))
            agg_hist += np.histogram(np.max(probs, axis=1),
                                     bins=SCORE_HIST_BINS, range=(0, 1))[0]
            agg_total += len(cls)
            write_summary(0, [], n_images=len(paths))
        print("RUN IS DONE ({} images)".format(len(paths)))
