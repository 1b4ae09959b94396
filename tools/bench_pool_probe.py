"""TPU decision probe: can a custom maxpool BACKWARD beat SelectAndScatter?

Round-3 categorized profile (tools/profile_ops.py --categories): maxpool
backward = SelectAndScatter fusions, 3.1 ms of the 62.1 ms inception@299
b128 train step (5.0%), running at ~51% of HBM bandwidth for the 147²
shape. The round-2 attempt replaced the FORWARD with strided slices and
lost 6x to vector relayouts (models/layers.py:110 docstring). This probe
keeps the fast reduce_window forward and swaps only the VJP:

  gx[i] = sum over the k² window offsets d of
            G~[i-d] * (x[i] == Y~[i-d])           (tie mass split by /cnt)

where Y~/G~ are the pooled max / (cotangent ÷ tie-count) interior-dilated
by the stride back to input resolution — k² shifted elementwise terms, one
loop fusion, no scatter. Tie routing deviates from torch/SnS (first-index)
by splitting gradient mass equally across tied positions; mass is
conserved exactly. The probe (a) verifies the math against jax.vjp on
untied f32 input, (b) verifies tie-mass conservation, (c) times fwd+bwd
both ways, dependency-chained (CLAUDE.md timing discipline), on the four
inception_v3@299 maxpool shapes.

Decision rule: wire into models/layers.py only if the summed per-step
saving clears ~1.5 ms (≥2% e2e) — below that the tie-routing deviation
isn't worth documenting.

Run: python tools/bench_pool_probe.py [--batch 128] [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def maxpool_fwd(x, k, s, p):
    """Same form as models/layers.py max_pool (the fast one on TPU)."""
    import jax.numpy as jnp
    from jax import lax
    pads = ((0, 0), (p, p), (p, p), (0, 0))
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, k, k, 1), (1, s, s, 1), pads)


def maxpool_bwd_fast(x, y, g, k, s, p):
    """Scatter-free maxpool VJP: k² shifted equality-mask terms.

    Ties split the cotangent equally (g/cnt) instead of routing to the
    first index like SelectAndScatter/torch; total mass identical.
    """
    import jax.numpy as jnp
    from jax import lax

    B, H, W, C = x.shape
    Oy, Ox = y.shape[1], y.shape[2]
    # padded-input extent per dim: exactly the window-coverage extent
    Hp, Wp = (Oy - 1) * s + k, (Ox - 1) * s + k
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = lax.pad(x, neg, ((0, 0, 0), (p, Hp - H - p, 0),
                          (p, Wp - W - p, 0), (0, 0, 0)))

    # tie count per window: k² strided slices of xp compared to y
    cnt = None
    for dy in range(k):
        for dx in range(k):
            xs = lax.slice(xp, (0, dy, dx, 0),
                           (B, dy + (Oy - 1) * s + 1, dx + (Ox - 1) * s + 1, C),
                           (1, s, s, 1))
            eq = (xs == y).astype(jnp.float32)
            cnt = eq if cnt is None else cnt + eq
    gn = (g.astype(jnp.float32) / cnt).astype(g.dtype)

    # dilate y and gn back to padded-input resolution, with a (k-1) margin
    # on both sides so every shift is a plain (unstrided) slice
    dil = ((0, 0, 0), (k - 1, k - 1, s - 1), (k - 1, k - 1, s - 1), (0, 0, 0))
    yd = lax.pad(y, neg, dil)
    gd = lax.pad(gn, jnp.asarray(0, g.dtype), dil)

    gxp = None
    zero = jnp.asarray(0, g.dtype)
    for dy in range(k):
        for dx in range(k):
            ys = lax.slice(yd, (0, k - 1 - dy, k - 1 - dx, 0),
                           (B, k - 1 - dy + Hp, k - 1 - dx + Wp, C))
            gs = lax.slice(gd, (0, k - 1 - dy, k - 1 - dx, 0),
                           (B, k - 1 - dy + Hp, k - 1 - dx + Wp, C))
            term = jnp.where(xp == ys, gs, zero)
            gxp = term if gxp is None else gxp + term
    return lax.slice(gxp, (0, p, p, 0), (B, p + H, p + W, C))


def check_numerics():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(7)
    ok = True
    for (H, C, k, s, p) in [(17, 8, 3, 2, 0), (14, 4, 2, 2, 0),
                            (15, 4, 3, 2, 1), (9, 4, 3, 1, 1)]:
        x = jax.random.normal(key, (2, H, H, C), jnp.float32)
        y, vjp = jax.vjp(lambda v: maxpool_fwd(v, k, s, p), x)
        g = jax.random.normal(jax.random.PRNGKey(1), y.shape, jnp.float32)
        (gx_ref,) = vjp(g)
        gx = maxpool_bwd_fast(x, y, g, k, s, p)
        err = float(jnp.max(jnp.abs(gx - gx_ref)))
        ok &= err < 1e-5
        print(json.dumps({"check": f"untied f32 H={H} k={k} s={s} p={p}",
                          "max_abs_err_vs_autodiff": err}))
    # tie behavior: constant input => every window fully tied; mass conserved
    x = jnp.ones((1, 7, 7, 2), jnp.float32)
    y = maxpool_fwd(x, 3, 2, 0)
    g = jnp.ones_like(y)
    gx = maxpool_bwd_fast(x, y, g, 3, 2, 0)
    mass_ok = abs(float(gx.sum()) - float(g.sum())) < 1e-5
    ok &= mass_ok
    print(json.dumps({"check": "tied mass conservation", "ok": mass_ok,
                      "sum_gx": float(gx.sum()), "sum_g": float(g.sum())}))
    return ok


def bench(step, x0, iters, trials=5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda i, c: step(c), x)

    out = loop(x0)
    float(jnp.asarray(out).astype(jnp.float32).sum())  # compile + drain
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = loop(x0)
        float(jnp.asarray(out).astype(jnp.float32).sum())  # forced fetch
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ifcb_classifier_tpu.utils.config import enable_compile_cache
    enable_compile_cache()

    if not check_numerics():
        print(json.dumps({"verdict": "NUMERICS FAIL — do not wire"}))
        return
    if args.check_only:
        return

    B = args.batch
    # the four maxpools of inception_v3 @299 (all 3x3 stride 2, pad 0)
    cases = [("pool1 @147x64", 147, 64), ("pool2 @71x192", 71, 192),
             ("Mixed_6a @35x288", 35, 288), ("Mixed_7a @17x768", 17, 768)]
    k, s, p = 3, 2, 0

    results, tot_a, tot_b = [], 0.0, 0.0
    for name, H, C in cases:
        x0 = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, C),
                               jnp.bfloat16)

        def step_autodiff(x):
            y, vjp = jax.vjp(lambda v: maxpool_fwd(v, k, s, p), x)
            (gx,) = vjp(y * jnp.asarray(0.01, y.dtype))
            return x + jnp.asarray(0.001, x.dtype) * gx

        def step_fast(x):
            y = maxpool_fwd(x, k, s, p)
            gx = maxpool_bwd_fast(x, y, y * jnp.asarray(0.01, y.dtype),
                                  k, s, p)
            return x + jnp.asarray(0.001, x.dtype) * gx

        t_a = bench(step_autodiff, x0, args.iters)
        t_b = bench(step_fast, x0, args.iters)
        tot_a += t_a
        tot_b += t_b
        r = dict(case=name, sns_ms=round(t_a * 1e3, 3),
                 fast_ms=round(t_b * 1e3, 3),
                 delta_ms=round((t_a - t_b) * 1e3, 3),
                 speedup=round(t_a / t_b, 3))
        results.append(r)
        print(json.dumps(r))

    saving = (tot_a - tot_b) * 1e3
    print(json.dumps({
        "total_sns_ms": round(tot_a * 1e3, 3),
        "total_fast_ms": round(tot_b * 1e3, 3),
        "saving_ms_per_step": round(saving, 3),
        "verdict": ("WIRE IT" if saving > 1.5 else "REJECT") +
                   " (threshold 1.5 ms vs 62.1 ms step; both arms share the"
                   " identical reduce_window forward, so the delta is pure"
                   " backward)",
        "results": results}))


if __name__ == "__main__":
    main()
