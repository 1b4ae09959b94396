"""Train state and the jitted train/eval steps.

Replaces the reference's LightningModule step methods
(/root/reference/neuston_models.py:63-149) with pure-functional JAX:

  * Adam lr=0.001, no scheduler (neuston_models.py:63-64) via optax
  * CE loss; inception aux combined as loss1 + 0.4*loss2 (neuston_models.py:70-78)
  * batches are padded to a static size and masked (mask=False rows contribute
    zero loss and are dropped from metrics) so one compiled step serves every
    batch including the short last one
  * per-batch *mean* CE over valid rows, matching torch CrossEntropyLoss
    reduction; the epoch-level val_loss is the SUM of batch means
    (neuston_models.py:109 — quirky but load-bearing for early-stop parity)

BatchNorm stats live in the 'batch_stats' collection and update each train
step; dropout/flip randomness threads through an explicit PRNG key.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(optimizer: str = "Adam", learning_rate: float = 0.001,
                   weight_decay: float = 0.0):
    """Build the optax transform for the `--optimizer/--learning-rate/
    --weight-decay` surface the reference reserved but left commented out
    (neuston_net.py:385-388). Torch-semantics choices:

      Adam   torch.optim.Adam — L2 weight decay folded into the gradient
             BEFORE the moment updates (optax.add_decayed_weights upstream
             of scale_by_adam), matching torch's coupled decay
      AdamW  decoupled decay (optax.adamw == torch.optim.AdamW)
      SGD    momentum 0.9 (stated in the CLI help; torch's default is 0 but
             momentumless SGD is never what a CNN user wants)
    """
    opt = optimizer.lower()
    if opt == "adam":
        if not weight_decay:
            # identical pytree to the historical optax.adam state so
            # pre-existing chkpts/last.state files keep resuming
            return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-learning_rate))
    if opt == "adamw":
        return optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=weight_decay)
    if opt == "sgd":
        sgd = optax.sgd(learning_rate, momentum=0.9)
        if weight_decay:
            return optax.chain(optax.add_decayed_weights(weight_decay), sgd)
        return sgd
    raise ValueError(f"unknown optimizer {optimizer!r} "
                     "(choose Adam, AdamW, or SGD)")


def create_train_state(model, rng, input_size: int,
                       learning_rate: float = 0.001,
                       optimizer: str = "Adam", weight_decay: float = 0.0):
    """Initialize params/batch_stats (train=True so aux heads materialize)
    and the optimizer (default Adam with torch betas/eps,
    neuston_models.py:63-64)."""
    dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    p_rng, d_rng = jax.random.split(rng)
    variables = model.init({"params": p_rng, "dropout": d_rng}, dummy, train=True)
    tx = make_optimizer(optimizer, learning_rate, weight_decay)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)), tx


def cross_entropy(logits, labels, mask, class_weights=None):
    """Mean CE over valid rows (torch CrossEntropyLoss reduction='mean').

    class_weights (the `--class-norm` surface, neuston_net.py:389): per-class
    loss weights with torch CrossEntropyLoss(weight=w) semantics — weighted
    mean Σ w[y_i]·nll_i / Σ w[y_i] over valid rows."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    mask = mask.astype(jnp.float32)
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)[labels] * mask
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-9)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def loss_fn(outputs, labels, mask, class_weights=None):
    """CE with the inception aux rule (neuston_models.py:70-78)."""
    if isinstance(outputs, tuple) and len(outputs) == 2:
        main, aux = outputs
        return (cross_entropy(main, labels, mask, class_weights) +
                0.4 * cross_entropy(aux, labels, mask, class_weights))
    return cross_entropy(outputs, labels, mask, class_weights)


def _mxu_and_reductions_saveable(prim, *_, **__):
    """jax.checkpoint policy for remat="convs": save the outputs of MXU ops
    (convs/matmuls) and of reductions (BN batch stats, pooling), recompute
    everything elementwise (BN normalize, relu, casts) inside the backward
    fusions. On an HBM-bound CNN the post-BN activations then never
    materialize in HBM as residuals — roughly halving the conv→BN→relu
    residual traffic — while the recompute is cheap vector work XLA fuses
    into the consuming backward kernels. Reductions are saved because
    recomputing a batch-stat sum would re-read the full conv output (bytes,
    the thing being economized) to regenerate a [C]-sized vector."""
    return prim.name in ("conv_general_dilated", "dot_general",
                         "reduce_sum", "reduce_max", "reduce_window_max",
                         "reduce_window_sum", "reduce_window", "add_any",
                         "cumsum", "argmax")


def make_train_step(model, tx, axis_name: str | None = None,
                    remat: bool | str = False, class_weights=None,
                    accum: int = 1):
    """One optimizer step: grads (+psum over `axis_name` if data-parallel),
    BN update, optimizer update. Donates the state buffer.

    remat=True (or "full") rematerializes the whole forward pass in backprop
    (jax.checkpoint): ~1.3x FLOPs for a several-fold activation-memory cut,
    unlocking larger per-chip batches (inception@299 spills HBM past batch
    128 without it). remat="convs" is the selective policy
    (_mxu_and_reductions_saveable): keeps conv/matmul/reduction outputs,
    recomputes elementwise chains in the backward — a bandwidth play rather
    than a capacity play.

    class_weights: per-class training-loss weights (`--class-norm`); the
    validation loss stays unweighted so best-epoch/early-stop selection
    remains comparable across runs (documented in QUIRKS.md).

    accum > 1 (the `--accum` surface; no reference analog) takes ONE
    optimizer step per batch but runs the forward/backward over `accum`
    sequential micro-batches of batch/accum rows under lax.scan, so
    activation memory scales with the micro-batch while the gradient is
    EXACTLY the masked-mean gradient of the full batch (micro grads are
    combined weighted by each micro's valid-row count — or Σw under
    --class-norm — so short/padded tails don't skew the mean). Micro k
    takes the INTERLEAVED rows [k::accum] (not a contiguous block): on a
    'data'-sharded mesh every device then keeps its own rows for every
    micro and the split compiles collective-free, where a contiguous
    split all-gathered the full image batch each step. Matches a torch
    accumulate-then-step loop over the same row assignment bit-for-bit in
    semantics, including BatchNorm: each micro-batch normalizes by its
    OWN batch stats and the running stats update sequentially micro-batch
    by micro-batch — which also means accum=N is NOT numerically
    identical to accum=1 (same as torch; the effective BN batch is the
    micro-batch).
    """
    cw = None if class_weights is None else jnp.asarray(class_weights,
                                                        jnp.float32)

    def train_step(state: TrainState, batch, dropout_rng):
        def apply_fn(params, stats, images, rng):
            return model.apply(
                {"params": params, "batch_stats": stats},
                images, train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"])

        if remat == "convs":
            apply_fn = jax.checkpoint(
                apply_fn, policy=_mxu_and_reductions_saveable)
        elif remat:
            apply_fn = jax.checkpoint(apply_fn)

        def micro_loss(params, stats, mb, rng):
            outputs, mutated = apply_fn(params, stats, mb["images"], rng)
            loss = loss_fn(outputs, mb["labels"], mb["mask"], cw)
            mask = mb["mask"].astype(jnp.float32)
            denom = (jnp.sum(cw[mb["labels"]] * mask) if cw is not None
                     else jnp.sum(mask))
            return loss, (mutated["batch_stats"], denom)

        grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

        if accum == 1:
            (loss, (new_stats, local_w)), grads = grad_fn(
                state.params, state.batch_stats, batch, dropout_rng)
        else:
            b = batch["images"].shape[0]
            assert b % accum == 0, (b, accum)
            # INTERLEAVED micro-batches (row r -> micro r % accum): under a
            # row-block 'data' sharding every device keeps its own rows for
            # every micro (position j of micro k is global row j*accum+k,
            # which stays inside the same device's block whenever the micro
            # size divides evenly over 'data' — the loop rounds batch to
            # n_data*accum), so GSPMD compiles the split collective-free.
            # A contiguous reshape instead all-gathered the FULL image
            # batch every step (micro k's rows span devices; verified in
            # HLO: all-gather of the [B,H,W,3] input on an 8-device mesh).
            # The full-batch gradient is identical either way (the combine
            # is row-order independent); BN micro composition and per-micro
            # dropout keys differ from a contiguous split exactly as they
            # would under any other shuffle of the batch.
            micro = {k: v.reshape((b // accum, accum) + v.shape[1:])
                     .swapaxes(0, 1) for k, v in batch.items()}
            rngs = jax.random.split(dropout_rng, accum)
            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)

            def body(carry, xs):
                stats, gsum, lsum, dsum = carry
                mb, rng = xs
                (loss, (stats, denom)), g = grad_fn(
                    state.params, stats, mb, rng)
                gsum = jax.tree_util.tree_map(
                    lambda a, gi: a + gi.astype(jnp.float32) * denom,
                    gsum, g)
                return (stats, gsum, lsum + loss * denom,
                        dsum + denom), None

            (new_stats, gsum, lsum, dsum), _ = jax.lax.scan(
                body,
                (state.batch_stats, zeros,
                 jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
                (micro, rngs))
            dsum = jnp.maximum(dsum, 1e-9)
            grads = jax.tree_util.tree_map(
                lambda g, p: (g / dsum).astype(p.dtype),
                gsum, state.params)
            loss = lsum / dsum
            local_w = dsum
        if axis_name:
            # weight each shard by its valid-row mass: per-shard grads are
            # already LOCAL masked means, so an unweighted pmean would
            # count a 1-valid-row shard (ragged tail, pads concentrated)
            # as much as a full one — biasing away from the exact global
            # masked-mean gradient the GSPMD path computes
            w = jnp.maximum(local_w.astype(jnp.float32), 1e-9)
            wg = jax.lax.psum(w, axis_name)
            grads = jax.tree_util.tree_map(
                lambda g: (jax.lax.psum(g.astype(jnp.float32) * w,
                                        axis_name) / wg).astype(g.dtype),
                grads)
            loss = jax.lax.psum(loss * w, axis_name) / wg
            new_stats = jax.lax.pmean(new_stats, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, loss

    return train_step


def make_eval_step(model):
    """Forward + softmax + per-batch mean CE (validation_step parity,
    neuston_models.py:94-103)."""

    def eval_step(state: TrainState, batch):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["images"], train=False)
        if isinstance(outputs, tuple):
            outputs = outputs[0]
        loss = cross_entropy(outputs, batch["labels"], batch["mask"])
        probs = jax.nn.softmax(outputs.astype(jnp.float32), axis=-1)
        return loss, probs

    return eval_step


def make_predict_step(model):
    """Forward + softmax for RUN mode (test_step parity,
    neuston_models.py:152-157)."""

    def predict_step(params, batch_stats, images):
        outputs = model.apply({"params": params, "batch_stats": batch_stats},
                              images, train=False)
        if isinstance(outputs, tuple):
            outputs = outputs[0]
        return jax.nn.softmax(outputs.astype(jnp.float32), axis=-1)

    return predict_step
