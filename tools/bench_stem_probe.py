"""TPU decision probe: is the int8 stem-conv ceiling real?

The resident int8 graph's two hottest ops (tools/profile_ops.py
--precision int8, b256) are the stride-1 stem convs:

  Conv2d_2b: 3x3  32->64  @147x147 SAME   3.31 ms (~123 TOPS, 31% of peak)
  Conv2d_4a: 3x3  80->192 @73->71 VALID   2.96 ms (~121 TOPS, 31% of peak)

Lane arithmetic says Conv2d_2b's MXU ceiling is ~37.5% (N=64 fills half
the 128 lanes, K=288 pads to 384) — so XLA may already be near the
achievable. This probe times (a) the real lax.conv with the resident
epilogue and (b) the EXACT same MACs as a dense int8 matmul (M = B*H*W,
K = kh*kw*Cin, N = Cout; im2col traffic excluded — pure MXU floor).
Only a large matmul/conv gap justifies a hand-written Pallas conv.

Timing discipline (CLAUDE.md): dispatches over the axon tunnel can
"complete" before executing, so each iteration is DEPENDENCY-CHAINED
inside one jitted fori_loop (iteration i+1's input is built from
iteration i's output) and a scalar is fetched inside the timed region.

Run: python tools/bench_stem_probe.py [--batch 256] [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INT8_PEAK = 394e12  # v5e int8 TOPS


def bench(make_step, x0, w, iters, trials=5):
    """make_step(w) -> f(x)->x chained step; times iters chained steps."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x, w):
        return jax.lax.fori_loop(
            0, iters, lambda i, c: make_step(w)(c), x)

    out = loop(x0, w)
    float(jnp.asarray(out).astype(jnp.float32).sum())  # compile + drain
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = loop(x0, w)
        float(jnp.asarray(out).astype(jnp.float32).sum())  # forced fetch
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ifcb_classifier_tpu.utils.config import enable_compile_cache
    enable_compile_cache()

    B = args.batch
    key = jax.random.PRNGKey(0)

    cases = [
        # (name, H_in, W_in, Cin, Cout, pad)  3x3 stride-1 stem convs
        ("Conv2d_2b 3x3 32->64 @147 SAME", 147, 147, 32, 64, "SAME"),
        ("Conv2d_4a 3x3 80->192 @73 VALID", 73, 73, 80, 192, "VALID"),
    ]
    results = []
    for name, H, W, Cin, Cout, pad in cases:
        Ho = H if pad == "SAME" else H - 2
        Wo = W if pad == "SAME" else W - 2
        flops = 2.0 * B * Ho * Wo * Cout * 9 * Cin

        x = jax.random.randint(key, (B, H, W, Cin), -127, 127, jnp.int8)
        w = jax.random.randint(key, (3, 3, Cin, Cout), -127, 127, jnp.int8)

        def conv_step(w, pad=pad, H=H, W=W, Cin=Cin):
            def step(xc):
                y = lax.conv_general_dilated(
                    xc, w, (1, 1), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                y = jnp.maximum(y.astype(jnp.float32) * 0.01, 0.0)
                y = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
                # chain: rebuild next input from this output
                if pad == "SAME":
                    return y[..., :Cin]
                return jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0))
                               )[..., :Cin]
            return step

        t_conv = bench(conv_step, x, w, args.iters)

        # same MACs as one dense matmul (im2col-free MXU floor). NOTE the
        # A-matrix re-read per iter is 9x the conv's input bytes — this arm
        # can be HBM-bound where the conv is not; it's a floor on MXU time,
        # not a simulation of an implicit-GEMM kernel.
        M, K, N = B * Ho * Wo, 9 * Cin, Cout
        a = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
        bm = jax.random.randint(key, (K, N), -127, 127, jnp.int8)

        def mm_step(bm, M=M, K=K):
            def step(ac):
                y = lax.dot_general(ac, bm, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                y = jnp.maximum(y.astype(jnp.float32) * 0.01, 0.0)
                y = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
                reps = -(-K // y.shape[1])  # ceil
                return jnp.tile(y, (1, reps))[:, :K]
            return step

        t_mm = bench(mm_step, a, bm, args.iters)

        r = dict(case=name,
                 conv_ms=round(t_conv * 1e3, 3),
                 conv_tops=round(flops / t_conv / 1e12, 1),
                 conv_pct_peak=round(100 * flops / t_conv / INT8_PEAK, 1),
                 matmul_ms=round(t_mm * 1e3, 3),
                 matmul_tops=round(flops / t_mm / 1e12, 1),
                 matmul_pct_peak=round(100 * flops / t_mm / INT8_PEAK, 1))
        results.append(r)
        print(json.dumps(r))
    print(json.dumps({"verdict": "pallas conv justified only if matmul_pct"
                                 " >> conv_pct", "results": results}))


if __name__ == "__main__":
    main()
