"""Cross-framework numerical parity: torch models with torchvision-exact
state_dict keys, ported through models/torch_port.py into flax, must produce
the same outputs. This validates the --weights porting path with REAL torch
tensors (no torchvision/network in this env) and pins our conv/BN/pool
semantics to torch's."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def _port_and_compare(torch_model, family, n_classes, size, atol):
    import jax
    import jax.numpy as jnp
    import torch

    from ifcb_classifier_tpu.models import get_namebrand_model
    from ifcb_classifier_tpu.models.torch_port import port_state_dict
    from ifcb_classifier_tpu.train.state import create_train_state

    torch_model.eval()
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()
          if "num_batches_tracked" not in k}

    flax_model = get_namebrand_model(family, n_classes, dtype=jnp.float32)
    state, _ = create_train_state(flax_model, jax.random.PRNGKey(0), size)
    params, stats = port_state_dict(family, sd, state.params,
                                    state.batch_stats, skip_head=False)

    rng = np.random.RandomState(0)
    x = rng.rand(2, size, size, 3).astype(np.float32)
    with torch.no_grad():
        t_out = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    if isinstance(t_out, tuple):
        t_out = t_out[0]
    f_out = flax_model.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x), train=False)
    if isinstance(f_out, tuple):
        f_out = f_out[0]
    t, f = t_out.numpy(), np.asarray(f_out)
    worst = float(np.abs(t - f).max())
    scale = float(np.abs(t).max())
    assert worst < atol, f"torch-vs-flax logits diverged: {worst} (scale {scale})"


class TestInceptionParity:
    def test_inception_v3_logits_match(self):
        """The flagship: 95 convs + BN(eps=1e-3) + asymmetric pads + avg/max
        pools + aux head, torch vs flax, same random weights."""
        from torch_inception_tv import Inception3
        import torch
        torch.manual_seed(0)
        _port_and_compare(Inception3(num_classes=5), "inception_v3", 5,
                          299, atol=2e-4)


class TestResNetParity:
    def test_resnet18_logits_match(self):
        """Covers stride-2 downsample convs, BN eps=1e-5, padded maxpool."""
        from torch_resnet_tv import ResNet18
        import torch
        torch.manual_seed(1)
        _port_and_compare(ResNet18(num_classes=5), "resnet18", 5,
                          224, atol=2e-4)


class TestMiscParity:
    def test_alexnet_logits_match(self):
        """CHW-vs-HWC flatten order into classifier.1 is the landmine here."""
        from torch_misc_tv import AlexNet
        import torch
        torch.manual_seed(2)
        _port_and_compare(AlexNet(5), "alexnet", 5, 224, atol=2e-4)

    def test_densenet121_logits_match(self):
        """Dense concat ordering + transition pooling."""
        from torch_misc_tv import DenseNet121
        import torch
        torch.manual_seed(3)
        _port_and_compare(DenseNet121(5), "densenet121", 5, 224, atol=2e-4)

    def test_squeezenet_logits_match(self):
        """ceil_mode max pooling + conv classifier head."""
        from torch_misc_tv import SqueezeNet11
        import torch
        torch.manual_seed(4)
        _port_and_compare(SqueezeNet11(5), "squeezenet", 5, 224, atol=2e-4)

    def test_efficientnet_b0_logits_match(self):
        """SE blocks, SiLU, depthwise convs, BN eps=1e-3, and the
        features.N.M.block key mapper."""
        from torch_misc_tv import EfficientNetB0
        import torch
        torch.manual_seed(5)
        _port_and_compare(EfficientNetB0(5), "efficientnet_b0", 5, 224,
                          atol=5e-4)

    def test_vgg11_logits_match(self):
        """Deep conv stack + the 512*49 flatten into classifier.0."""
        from torch_misc_tv import VGG11
        import torch
        torch.manual_seed(6)
        _port_and_compare(VGG11(5), "vgg11", 5, 224, atol=5e-4)
