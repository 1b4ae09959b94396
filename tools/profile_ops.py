"""Per-op device-time profile of the train or (folded) infer step.

Round 2's "flat profile" evidence was produced with ad-hoc notebook code;
this makes it a reproducible tool: trace N executions of the compiled step
with jax.profiler, parse the XSpace via jax.profiler.ProfileData, aggregate
device time by XLA op (fusion) name, and print the top-K with cumulative
percentages. The op names carry XLA's fusion labels, so "where do the
milliseconds go" is answered at the granularity the compiler actually
schedules. Reference workload being profiled: the reference's train loop
(neuston_net.py:101-115) / RUN loop (neuston_net.py:233-271) equivalents.

Usage (TPU):
  python tools/profile_ops.py --mode infer --model inception_v3 --batch 256
  python tools/profile_ops.py --mode train --model inception_v3 --batch 128
"""

import argparse
import collections
import glob
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _compiled_step(mode, model_name, batch, remat, precision="bf16"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ifcb_classifier_tpu.models import get_namebrand_model, input_size_for
    from ifcb_classifier_tpu.train.state import (create_train_state,
                                                 make_train_step)

    size = input_size_for(model_name)
    if mode == "train":
        model = get_namebrand_model(model_name, 50, dtype=jnp.bfloat16)
        state, tx = create_train_state(model, jax.random.PRNGKey(0), size)
        step = jax.jit(make_train_step(model, tx, remat=remat),
                       donate_argnums=0)
        rng = np.random.RandomState(0)
        b = dict(images=jnp.asarray(rng.rand(batch, size, size, 3),
                                    jnp.float32),
                 labels=jnp.asarray(rng.randint(0, 50, batch), jnp.int32),
                 mask=jnp.ones((batch,), bool))
        compiled = step.lower(state, b, jax.random.PRNGKey(0)).compile()

        def run(n):
            nonlocal state
            for i in range(n):
                state, loss = compiled(state, b, jax.random.PRNGKey(i))
            _ = float(loss)
        run.hlo_text = compiled.as_text
        return run

    # ONE build path shared with the roofline tool: the profiler must
    # profile exactly the graph roofline.py measures (and both mirror the
    # product engine build in infer/runner.py)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from roofline import build_infer_graph
    model, params, stats, predict = build_infer_graph(
        model_name, batch, size, fold=True, precision=precision)

    @jax.jit
    def f(params, stats, x, acc):
        p = predict(params, stats, x)
        return p, acc + jnp.sum(p)

    import numpy as np
    x = jnp.asarray(np.random.RandomState(0).rand(batch, size, size, 3),
                    jnp.float32)
    acc0 = jnp.zeros((), jnp.float32)
    compiled = f.lower(params, stats, x, acc0).compile()

    def run(n):
        acc = acc0
        for _ in range(n):
            p, acc = compiled(params, stats, x, acc)
        _ = float(acc)
    run.hlo_text = compiled.as_text
    return run


def collect(run, iters, outdir):
    import jax
    run(2)  # warm
    with jax.profiler.trace(outdir):
        t0 = time.perf_counter()
        run(iters)
        wall = time.perf_counter() - t0
    return wall


def top_ops(trace_dir, k):
    """Aggregate device-plane event durations by op name."""
    from jax.profiler import ProfileData
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    data = ProfileData.from_file(paths[0])

    def aggregate(lines):
        agg, total = collections.Counter(), 0.0
        for line in lines:
            for ev in line.events:
                agg[ev.name] += ev.duration_ns
                total += ev.duration_ns
        return agg, total

    planes = list(data.planes)
    device = [p for p in planes
              if "tpu" in p.name.lower() or "/device" in p.name.lower()]
    # The device plane carries several overlapping timelines: 'XLA Modules'
    # (one whole-program span), 'XLA Ops' (the real serialized execution
    # timeline — what we want), and 'Async XLA Ops' (DMA spans whose
    # durations include the time they overlap compute — summing those
    # double-counts wildly). Aggregate 'XLA Ops' only when present.
    lines = [ln for p in device for ln in p.lines if ln.name == "XLA Ops"]
    if not lines and device:
        # degraded mode: summing every device line re-introduces exactly
        # the double-counting described above — say so loudly instead of
        # presenting it like a clean trace
        lines = [ln for p in device for ln in p.lines]
        print("[WARNING: no 'XLA Ops' line on the device plane; summing "
              f"ALL device lines {[ln.name for ln in lines]} — totals may "
              "double-count overlapping module/DMA spans]")
    if not lines:
        # fall back to the busiest plane so the tool still says something
        # useful on unexpected backends; name it so the reader knows
        scored = sorted(((aggregate(p.lines)[1], p) for p in planes),
                        key=lambda x: -x[0])
        best = scored[0][1] if scored and scored[0][0] else None
        if best is not None:
            print(f"[no TPU plane; using busiest plane {best.name!r}; "
                  f"all planes: {[p.name for p in planes]}]")
            lines = list(best.lines)
    agg, total = aggregate(lines)
    return agg.most_common(k), total


def categorize(ops, hlo_text):
    """Cross-reference profiled fusion names against the optimized HLO to
    classify device time by WHAT each fusion actually is, not what XLA
    named it. Round 2's per-op table filed every `convert_reduce_fusion`
    as a standalone BN-stat reduction; the HLO shows most of them are
    kOutput CONVOLUTION fusions (window_config/convolution_algorithm_config
    in backend_config) with the stat reductions riding the conv's output
    epilogue — i.e. XLA already performs the conv+BN-stat fusion a custom
    kernel would target. This view makes that distinction reproducible."""
    import re
    info = {}
    for line in hlo_text.splitlines():
        ls = line.strip()
        m = re.match(r"%([\w.\-]+) = ", ls)
        if not m or m.group(1) in info:
            continue
        is_conv = ("window_config" in ls
                   or "convolution_algorithm_config" in ls)
        mm = re.search(r'op_name="([^"]+)"', ls)
        info[m.group(1)] = (is_conv, mm.group(1) if mm else "")
    cats = collections.Counter()
    total = 0.0
    for name, ns in ops:
        total += ns
        key = name[1:].split(" =")[0] if name.startswith("%") else name
        is_conv, op_name = info.get(key, (None, ""))
        if is_conv is None:
            cat = "unmatched"
        elif is_conv:
            # jvp-transpose scopes mark backward-pass convs (dgrad/wgrad)
            cat = ("conv fusion (bwd)" if "transpose(jvp" in op_name
                   else "conv fusion (fwd)")
        elif "select-and-scatter" in key:
            cat = "maxpool bwd (SelectAndScatter)"
        elif key.startswith(("reduce", "convert_reduce")):
            cat = "standalone reduction"
        elif "copy" in key:
            cat = "copies/layout"
        else:
            cat = "elementwise/other fusion"
        cats[cat] += ns
    return cats, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["train", "infer"], default="infer")
    ap.add_argument("--model", default="inception_v3")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--remat", nargs="?", const="full", default=False,
                    choices=["full", "convs"])
    ap.add_argument("--precision", default="bf16", choices=["bf16", "int8"],
                    help="precision of the infer graph (int8 = quant tier)")
    ap.add_argument("--categories", action="store_true",
                    help="also aggregate device time by fusion KIND "
                         "(conv fwd/bwd, maxpool bwd, reductions, copies) "
                         "via the optimized HLO's backend configs")
    args = ap.parse_args()
    if args.mode == "train" and args.precision == "int8":
        ap.error("--precision int8 applies to --mode infer only "
                 "(training is bf16; TRAIN rejects int8 in the product too)")

    from ifcb_classifier_tpu.utils.config import enable_compile_cache
    enable_compile_cache()
    run = _compiled_step(args.mode, args.model, args.batch, args.remat,
                         precision=args.precision)
    outdir = tempfile.mkdtemp(prefix="ifcbnn_prof_")
    wall = collect(run, args.iters, outdir)
    print(f"{args.mode} {args.model} b{args.batch}: "
          f"{wall / args.iters * 1e3:.2f} ms/step wall ({args.iters} iters)")
    ops, total = top_ops(outdir, args.top)
    print(f"device total {total / 1e6:.1f} ms over {args.iters} iters "
          f"({total / 1e6 / args.iters:.2f} ms/step)\n")
    cum = 0.0
    for name, ns in ops:
        cum += ns
        print(f"{ns / 1e6 / args.iters:8.3f} ms/step  "
              f"{ns / total * 100:5.1f}%  (cum {cum / total * 100:5.1f}%)  "
              f"{name[:110]}")
    if args.categories:
        all_ops, _ = top_ops(outdir, 10 ** 9)
        cats, ctotal = categorize(all_ops, run.hlo_text())
        print("\nby category (profiled fusions cross-referenced against "
              "the optimized HLO):")
        for cat, ns in cats.most_common():
            print(f"{ns / 1e6 / args.iters:8.3f} ms/step  "
                  f"{ns / ctotal * 100:5.1f}%  {cat}")
    print(f"\ntrace dir kept: {outdir}")


if __name__ == "__main__":
    main()
