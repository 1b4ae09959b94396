"""Training-dynamics parity vs pure-torch: from IDENTICAL ported weights the
update math — gradients, Adam moments, BatchNorm running-stat updates, and a
multi-step loss trajectory — must match torch, not just the forward logits
(tests/test_torch_parity.py stops there).

The reference's training math being reproduced (all /root/reference):
  * Adam lr=0.001, torch defaults            neuston_models.py:63-64
  * CE loss; inception aux = loss1+0.4*loss2 neuston_models.py:70-78
  * BN momentum 0.1, unbiased running_var    torchvision BasicConv2d defaults

Methodology note on tolerances: cross-framework f32 gradient equality cannot
be asserted elementwise — CNN+BN backward is ill-conditioned (heavy
cancellation), and Adam's step-1 update is ±lr·sign(g), so elements whose
gradient is below the noise floor legitimately step in opposite directions.
The sharp criteria used instead:
  1. flax f32 grads must be AS CLOSE to a float64 torch ground truth as
     torch's own f32 grads are (per tensor) — parity at the noise floor;
  2. optax.adam must match torch.optim.Adam exactly on well-conditioned
     synthetic grads (optimizer math isolated from model noise);
  3. BN running stats after one identical step must match tightly (this
     pinned flax's biased-update/one-pass-variance deviations, fixed in
     models/layers.py::TorchBN);
  4. the multi-step loss trajectory must track within the chaotic
     amplification envelope measured for this exact seed.
Dropout is set to 0 on both sides (framework RNGs can't be aligned);
dropout semantics are standard and orthogonal to the update math.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

LR = 1e-3


def _flax_model(family, n_classes):
    import jax.numpy as jnp
    if family == "inception_v3":
        from ifcb_classifier_tpu.models.inception import InceptionV3
        return InceptionV3(num_classes=n_classes, aux_logits=True,
                           dropout_rate=0.0, dtype=jnp.float32)
    from ifcb_classifier_tpu.models import get_namebrand_model
    return get_namebrand_model(family, n_classes, dtype=jnp.float32)


def _torch_model(family, n_classes, seed):
    import torch
    torch.manual_seed(seed)
    if family == "inception_v3":
        from torch_inception_tv import Inception3
        return Inception3(num_classes=n_classes, dropout=0.0)
    from torch_resnet_tv import ResNet18
    assert family == "resnet18"
    return ResNet18(num_classes=n_classes)


def _fresh_torch(family, n_classes, weights, dtype):
    """Same architecture re-instantiated with given weights/dtype (keeps the
    f64/f32 runs independent)."""
    import torch
    m = _torch_model(family, n_classes, seed=0)
    m.load_state_dict(weights)
    return m.to(dtype)


def _torch_loss(out, yt):
    import torch
    ce = torch.nn.CrossEntropyLoss()
    if isinstance(out, tuple) and out[1] is not None:
        return ce(out[0], yt) + 0.4 * ce(out[1], yt)
    if isinstance(out, tuple):
        out = out[0]
    return ce(out, yt)


def _torch_grads(family, n_classes, weights, x, y, dtype):
    import torch
    m = _fresh_torch(family, n_classes, weights, dtype)
    m.train()
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).to(dtype)
    yt = torch.from_numpy(y.astype(np.int64))
    loss = _torch_loss(m(xt), yt)
    loss.backward()
    return ({n: p.grad.detach().double().numpy().copy()
             for n, p in m.named_parameters()}, float(loss))


def _ported(family, n_classes, torch_model, size):
    import jax
    import jax.numpy as jnp

    from ifcb_classifier_tpu.models.torch_port import port_state_dict
    from ifcb_classifier_tpu.train.state import (TrainState,
                                                 create_train_state)
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()
          if "num_batches_tracked" not in k}
    fm = _flax_model(family, n_classes)
    state0, tx = create_train_state(fm, jax.random.PRNGKey(0), size)
    params, stats = port_state_dict(family, sd, state0.params,
                                    state0.batch_stats, skip_head=False)
    state = TrainState(params=params, batch_stats=stats,
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    return fm, state, tx, sd


def _flax_grads(fm, state, x, y):
    import jax
    import jax.numpy as jnp

    from ifcb_classifier_tpu.models.torch_port import export_state_dict
    from ifcb_classifier_tpu.train.state import loss_fn as lfn

    def compute(params):
        out, _ = fm.apply({"params": params,
                           "batch_stats": state.batch_stats},
                          jnp.asarray(x), train=True,
                          rngs={"dropout": jax.random.PRNGKey(9)},
                          mutable=["batch_stats"])
        return lfn(out, jnp.asarray(y), jnp.ones(len(y), bool))

    loss, grads = jax.jit(jax.value_and_grad(compute))(state.params)
    g = jax.device_get(grads)
    zeros_stats = jax.tree_util.tree_map(
        np.zeros_like, jax.device_get(state.batch_stats))
    fam = "inception_v3" if "Inception" in type(fm).__name__ else "resnet18"
    return export_state_dict(fam, g, zeros_stats), float(loss)


CASES = [("resnet18", 96, 8), ("inception_v3", 299, 2)]


@pytest.mark.parametrize("family,size,batch", CASES)
def test_gradients_match_torch_at_the_f32_noise_floor(family, size, batch):
    """Per tensor: ||g_flax32 − g_torch64|| ≤ 3·||g_torch32 − g_torch64|| +
    3e-5·||g_torch64||. flax grads are as accurate as torch's own f32 grads;
    a semantic difference (wrong aux weight, biased BN variance, one-pass
    variance cancellation) blows this bound by orders of magnitude."""
    import torch
    tm = _torch_model(family, 5, seed=11)
    rng = np.random.RandomState(3)
    x = rng.rand(batch, size, size, 3).astype(np.float32)
    y = rng.randint(0, 5, batch).astype(np.int32)
    g64, loss64 = _torch_grads(family, 5, tm.state_dict(), x, y,
                               torch.float64)
    g32, _ = _torch_grads(family, 5, tm.state_dict(), x, y, torch.float32)
    fm, state, _, _ = _ported(family, 5, tm, size)
    gf, loss_f = _flax_grads(fm, state, x, y)

    assert abs(loss_f - loss64) < 5e-4 * max(1.0, abs(loss64))
    bad = []
    for n, truth in g64.items():
        tn = max(np.linalg.norm(truth), 1e-30)
        t_dist = np.linalg.norm(g32[n] - truth) / tn
        f_dist = np.linalg.norm(gf[n] - truth) / tn
        if f_dist > 3 * t_dist + 3e-5:
            bad.append((n, f_dist, t_dist))
    assert not bad, f"grads noisier than torch's own f32: {bad[:5]}"


@pytest.mark.parametrize("family,size,batch", CASES)
def test_one_adam_step_and_bn_stats_match(family, size, batch):
    """One identical optimizer step from identical weights: BN running
    stats must match tightly (torch unbiased-var update semantics); params
    may differ by ±2·lr only on the tiny fraction of elements whose gradient
    is below the f32 noise floor (Adam step-1 = ±lr·sign(g))."""
    import jax
    import torch

    from ifcb_classifier_tpu.models.torch_port import export_state_dict
    from ifcb_classifier_tpu.train.state import make_train_step

    tm = _torch_model(family, 5, seed=11)
    fm, state, tx, sd0 = _ported(family, 5, tm, size)
    rng = np.random.RandomState(3)
    x = rng.rand(batch, size, size, 3).astype(np.float32)
    y = rng.randint(0, 5, batch).astype(np.int32)
    # f64 ground-truth gradients: sign flips are only legitimate where the
    # true gradient is itself near zero (below the f32 noise floor, which we
    # calibrate per tensor from torch's OWN f32 error vs the f64 truth)
    g64, _ = _torch_grads(family, 5, tm.state_dict(), x, y, torch.float64)
    g32, _ = _torch_grads(family, 5, tm.state_dict(), x, y, torch.float32)

    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=LR)
    loss = _torch_loss(tm(torch.from_numpy(x.transpose(0, 3, 1, 2))),
                       torch.from_numpy(y.astype(np.int64)))
    opt.zero_grad()
    loss.backward()
    opt.step()

    import jax.numpy as jnp
    step_fn = jax.jit(make_train_step(fm, tx))
    batch_d = dict(images=jnp.asarray(x), labels=jnp.asarray(y),
                   mask=np.ones(batch, bool))
    state1, loss_f = step_fn(state, batch_d, jax.random.PRNGKey(9))
    assert abs(float(loss_f) - float(loss)) < 5e-4 * max(1.0, float(loss))

    f_sd = export_state_dict(family, jax.device_get(state1.params),
                             jax.device_get(state1.batch_stats))
    t_sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()
            if "num_batches_tracked" not in k}
    strong_flips, total = 0, 0
    for n, tv in t_sd.items():
        fv = f_sd[n]
        if "running" in n:
            rel = np.linalg.norm(fv - tv) / max(np.linalg.norm(tv), 1e-30)
            # 5e-4: deep small-spatial BNs (aux tower @1x1, batch 2) carry
            # ~2.6e-4 f32 noise; a biased-var update bug shows ~2% here
            assert rel < 5e-4, f"BN running stat diverged: {n} rel={rel}"
        else:
            d = np.abs(fv - tv)
            assert d.max() <= 2.05 * LR, (n, float(d.max()))
            # flips on elements whose TRUE gradient is well above the noise
            # floor would mean the frameworks disagree on real signal;
            # noise floor per tensor = torch's own f32 error vs f64
            noise = max(np.abs(g32[n] - g64[n]).max(), 1e-30)
            strong = np.abs(g64[n]) > 10 * noise
            strong_flips += int(((d > LR) & strong).sum())
            total += d.size
    assert strong_flips / total < 1e-5, \
        f"sign flips on well-conditioned gradients: {strong_flips}/{total}"


def test_adam_math_matches_torch_exactly():
    """optax.adam vs torch.optim.Adam on IDENTICAL well-conditioned synthetic
    gradients for 10 steps: the moment/bias-correction/update math itself,
    isolated from model noise, must agree to f32 roundoff."""
    import jax.numpy as jnp
    import optax
    import torch

    rng = np.random.RandomState(0)
    p0 = rng.randn(64, 32).astype(np.float32)
    grads = [rng.randn(64, 32).astype(np.float32) * (1 + 0.5 * k)
             for k in range(10)]

    pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([pt], lr=LR, betas=(0.9, 0.999), eps=1e-8)
    for g in grads:
        opt.zero_grad()
        pt.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8)
    pf = jnp.asarray(p0)
    s = tx.init(pf)
    for g in grads:
        upd, s = tx.update(jnp.asarray(g), s, pf)
        pf = optax.apply_updates(pf, upd)

    np.testing.assert_allclose(np.asarray(pf), pt.detach().numpy(),
                               atol=2e-6, rtol=0)


def test_resnet18_loss_trajectory_tracks_torch():
    """3 epochs × 4 batches from identical ported weights, fixed batch
    order, no flips/dropout: per-step losses must track torch's within the
    measured chaotic-amplification envelope (early steps ~1e-4, later ≤5e-2
    as Adam amplifies f32 noise; a semantic bug shows up as 2-10× this)."""
    import jax
    import jax.numpy as jnp
    import torch

    from ifcb_classifier_tpu.train.state import make_train_step

    tm = _torch_model("resnet18", 5, seed=1)
    fm, state, tx, _ = _ported("resnet18", 5, tm, 64)
    rng = np.random.RandomState(0)
    B, S, E, K = 8, 64, 3, 4
    xs = [rng.rand(B, S, S, 3).astype(np.float32) for _ in range(K)]
    ys = [rng.randint(0, 5, B).astype(np.int32) for _ in range(K)]

    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=LR)
    t_losses = []
    for _ in range(E):
        for k in range(K):
            loss = _torch_loss(
                tm(torch.from_numpy(xs[k].transpose(0, 3, 1, 2))),
                torch.from_numpy(ys[k].astype(np.int64)))
            opt.zero_grad()
            loss.backward()
            opt.step()
            t_losses.append(float(loss))

    step_fn = jax.jit(make_train_step(fm, tx))
    s = state
    f_losses = []
    for _ in range(E):
        for k in range(K):
            b = dict(images=jnp.asarray(xs[k]), labels=jnp.asarray(ys[k]),
                     mask=np.ones(B, bool))
            s, l = step_fn(s, b, jax.random.PRNGKey(9))
            f_losses.append(float(l))

    diffs = [abs(a - b) for a, b in zip(t_losses, f_losses)]
    assert diffs[0] < 1e-4, f"step-0 loss mismatch: {diffs[0]}"
    assert diffs[1] < 2e-3, f"step-1 loss mismatch: {diffs[1]}"
    assert max(diffs) < 5e-2, (t_losses, f_losses)
    # both runs actually learned (same corpus, same curve shape)
    assert t_losses[-1] < 0.2 and f_losses[-1] < 0.2
