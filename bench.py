"""Headline benchmark: Inception-v3 @299 training images/sec/chip (bf16).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is computed
against a measured stand-in recorded in BENCH_BASELINE.json (the same
architecture/batch on this host's torch-CPU — reference GPU hardware is not
available here; see BASELINE.md). Falls back to 1.0 if absent.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.train.state import create_train_state, make_train_step
    from ifcb_classifier_tpu.utils.config import enable_compile_cache

    enable_compile_cache()

    BATCH = int(os.environ.get("BENCH_BATCH", "128"))
    model = get_namebrand_model("inception_v3", 50, dtype=jnp.bfloat16)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), 299)
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)

    rng = np.random.RandomState(0)
    batch = dict(images=jnp.asarray(rng.rand(BATCH, 299, 299, 3), jnp.float32),
                 labels=jnp.asarray(rng.randint(0, 50, BATCH), jnp.int32),
                 mask=jnp.ones((BATCH,), bool))

    # warmup / compile (2 steps: the first post-donation step also differs)
    for i in range(2):
        state, loss = step(state, batch, jax.random.PRNGKey(i))
    _ = float(loss)

    # NOTE: through the axon tunnel, block_until_ready() alone over-reports
    # throughput (async completion signals are unreliable on this
    # experimental platform) — force REAL device->host fetches of the loss
    # and a param checksum so timing covers the whole dependency chain.
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for i in range(iters):
        state, loss = step(state, batch, jax.random.PRNGKey(i))
    _ = float(loss)
    _ = float(jnp.sum(jnp.abs(state.params["fc"]["kernel"]).astype(jnp.float32)))
    dt = time.perf_counter() - t0
    imgs_per_sec = BATCH * iters / dt

    vs_baseline = 1.0
    base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
    if os.path.isfile(base_file):
        with open(base_file) as f:
            base = json.load(f)
        if base.get("imgs_per_sec"):
            vs_baseline = imgs_per_sec / float(base["imgs_per_sec"])

    print(json.dumps({
        "metric": "inception_v3_299_bf16_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
