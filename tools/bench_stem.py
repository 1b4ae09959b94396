"""TPU ablation bench for the inception stem (VERDICT round-1 #2).

Measures, on the real TPU (bf16, batch from BENCH_BATCH, default 128):
  1. full inception_v3 train step, standard stem
  2. full inception_v3 train step, space-to-depth stem (stem_s2d=True)
  3. stem-only subnetwork (Conv2d_1a..maxpool..Conv2d_4a..maxpool) fwd+bwd,
     both stem variants — isolates where the time goes

Timing discipline (CLAUDE.md): device-resident loop, one dependency-chained
fetch at the end; repeated trials; compile cache enabled so reruns are warm.

Run: python tools/bench_stem.py [--iters 20] [--trials 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_step(step, state, batch, rngs, iters, trials):
    import jax
    import jax.numpy as jnp
    best = float("inf")
    s = state  # donated buffers: carry the state across trials, never reuse
    for _ in range(trials):
        t0 = time.perf_counter()
        for i in range(iters):
            s, loss = step(s, batch, rngs[i % len(rngs)])
        _ = float(loss)
        _ = float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(s.params)[0]
                                  ).astype(jnp.float32)))
        dt = time.perf_counter() - t0
        best = min(best, dt / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--batch", type=int,
                    default=int(os.environ.get("BENCH_BATCH", "128")))
    ap.add_argument("--skip-stem-only", action="store_true")
    ap.add_argument("--layers", action="store_true",
                    help="per-layer stem conv fwd+bwd breakdown")
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ifcb_classifier_tpu.models.inception import (BasicConv2dS2D,
                                                      InceptionV3, _bc)
    from ifcb_classifier_tpu.train.state import (create_train_state,
                                                 make_train_step)
    from ifcb_classifier_tpu.utils.config import enable_compile_cache

    enable_compile_cache()
    B = args.batch
    rng = np.random.RandomState(0)
    batch = dict(images=jnp.asarray(rng.rand(B, 299, 299, 3), jnp.float32),
                 labels=jnp.asarray(rng.randint(0, 50, B), jnp.int32),
                 mask=jnp.ones((B,), bool))
    rngs = [jax.random.PRNGKey(i) for i in range(4)]
    results = {}

    if args.layers:
        # per-layer fwd+bwd: where do the stem's 25 ms actually go?
        from ifcb_classifier_tpu.models.layers import max_pool
        specs = [
            ("1a_conv3x3s2_3-32", (B, 299, 299, 3),
             lambda d: _bc(32, 3, stride=2, dtype=d, name="c")),
            ("2a_conv3x3_32-32", (B, 149, 149, 32),
             lambda d: _bc(32, 3, dtype=d, name="c")),
            ("2b_conv3x3p1_32-64", (B, 147, 147, 32),
             lambda d: _bc(64, 3, padding=1, dtype=d, name="c")),
            ("pool1_147-73", (B, 147, 147, 64), "pool"),
            ("3b_conv1x1_64-80", (B, 73, 73, 64),
             lambda d: _bc(80, 1, dtype=d, name="c")),
            ("4a_conv3x3_80-192", (B, 73, 73, 80),
             lambda d: _bc(192, 3, dtype=d, name="c")),
            ("pool2_71-35", (B, 71, 71, 192), "pool"),
        ]
        # the iteration loop lives INSIDE the jit (lax.scan): one dispatch
        # per trial, so tunnel dispatch latency (~3-5 ms/call) can't floor
        # the per-layer numbers
        for name, shape, make in specs:
            x = jnp.asarray(rng.rand(*shape), jnp.bfloat16)
            if make == "pool":
                @jax.jit
                def f(x):
                    def lf(x):
                        return jnp.mean(max_pool(x, 3, 2).astype(jnp.float32))

                    def body(acc, _):
                        dep = (1.0 + acc * 1e-12).astype(x.dtype)
                        l, g = jax.value_and_grad(lf)(x * dep)
                        return acc + l + jnp.mean(g.astype(jnp.float32)), None
                    acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                          None, length=args.iters)
                    return acc
            else:
                m = make(jnp.bfloat16)
                v = m.init({"params": jax.random.PRNGKey(0)}, x, True)
                p0, bs0 = v["params"], v["batch_stats"]

                @jax.jit
                def f(x, p0=p0, bs0=bs0, m=m):
                    def body(carry, _):
                        acc, bs = carry

                        def lf(p):
                            out, mut = m.apply(
                                {"params": p, "batch_stats": bs},
                                x * (1.0 + acc * 1e-12).astype(x.dtype),
                                True,
                                mutable=["batch_stats"])
                            return (jnp.mean(out.astype(jnp.float32)),
                                    mut["batch_stats"])
                        (l, bs), g = jax.value_and_grad(lf, has_aux=True)(p0)
                        acc = acc + l + jnp.mean(
                            jax.tree_util.tree_leaves(g)[0]
                            .astype(jnp.float32))
                        return (acc, bs), None
                    (acc, _), _ = jax.lax.scan(
                        body, (jnp.zeros((), jnp.float32), bs0), None,
                        length=args.iters)
                    return acc
            acc = f(x)
            _ = float(acc)
            best = float("inf")
            for _t in range(args.trials):
                t0 = time.perf_counter()
                _ = float(f(x))
                best = min(best, (time.perf_counter() - t0) / args.iters)
            results[f"layer_{name}_ms"] = round(best * 1e3, 3)
            print(f"layer {name:22s}: {best*1e3:8.3f} ms", flush=True)
        print(json.dumps(results))
        return

    for tag, s2d in (("standard", False), ("s2d", True)):
        model = InceptionV3(num_classes=50, stem_s2d=s2d, dtype=jnp.bfloat16)
        state, tx = create_train_state(model, jax.random.PRNGKey(0), 299)
        step = jax.jit(make_train_step(model, tx), donate_argnums=0)
        state, loss = step(state, batch, rngs[0])  # compile + post-donation
        state, loss = step(state, batch, rngs[1])
        _ = float(loss)
        dt = time_step(step, state, batch, rngs, args.iters, args.trials)
        results[f"full_{tag}_ms"] = round(dt * 1e3, 2)
        results[f"full_{tag}_img_s"] = round(B / dt, 1)
        print(f"full train step [{tag:8s}]: {dt*1e3:7.2f} ms "
              f"({B/dt:8.1f} img/s)", flush=True)

    if not args.skip_stem_only:
        class Stem(nn.Module):
            s2d: bool = False

            @nn.compact
            def __call__(self, x, train: bool = True):
                d = jnp.bfloat16
                from ifcb_classifier_tpu.models.layers import max_pool
                if self.s2d:
                    x = BasicConv2dS2D(32, d, name="Conv2d_1a_3x3")(x, train)
                else:
                    x = _bc(32, 3, stride=2, dtype=d,
                            name="Conv2d_1a_3x3")(x, train)
                x = _bc(32, 3, dtype=d, name="Conv2d_2a_3x3")(x, train)
                x = _bc(64, 3, padding=1, dtype=d, name="Conv2d_2b_3x3")(x, train)
                x = max_pool(x, 3, 2)
                x = _bc(80, 1, dtype=d, name="Conv2d_3b_1x1")(x, train)
                x = _bc(192, 3, dtype=d, name="Conv2d_4a_3x3")(x, train)
                x = max_pool(x, 3, 2)
                return jnp.mean(x.astype(jnp.float32))

        for tag, s2d in (("standard", False), ("s2d", True)):
            m = Stem(s2d=s2d)
            v = m.init({"params": jax.random.PRNGKey(0)}, batch["images"])

            @jax.jit
            def stem_step(params, bstats, x):
                def loss_fn(p):
                    out, mut = m.apply({"params": p, "batch_stats": bstats},
                                       x, train=True, mutable=["batch_stats"])
                    return out, mut["batch_stats"]
                (l, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params)
                return l, g, new_bs

            l, g, bs = stem_step(v["params"], v["batch_stats"],
                                 batch["images"])
            _ = float(l)
            best = float("inf")
            for _ in range(args.trials):
                t0 = time.perf_counter()
                for i in range(args.iters):
                    l, g, bs = stem_step(v["params"], bs, batch["images"])
                _ = float(l)
                _ = float(jnp.sum(jax.tree_util.tree_leaves(g)[0]
                                  .astype(jnp.float32)))
                best = min(best, (time.perf_counter() - t0) / args.iters)
            results[f"stem_{tag}_ms"] = round(best * 1e3, 2)
            print(f"stem-only fwd+bwd [{tag:8s}]: {best*1e3:7.2f} ms",
                  flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
