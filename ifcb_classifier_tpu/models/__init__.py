"""Flax CNN backbone zoo with classifier-head surgery.

TPU-native re-implementation of the reference's torchvision model zoo
(/root/reference/neuston_models.py:22-45): every family the reference's
`get_namebrand_model` dispatches on — inception_v3 (with aux head), alexnet,
squeezenet (→1_1), vgg*, resnet*, densenet* — plus efficientnet_b* (BASELINE
config #3). Models are NHWC, bf16-compute friendly (param dtype stays f32),
and structurally parity-checked against torchvision via exact parameter
counts (tests/test_models.py).

`pretrained` parity note: the reference downloads torchvision ImageNet
weights (neuston_models.py:24-42). This environment has no torchvision and no
network, so `pretrained=True` loads ported weights from a user-supplied torch
state_dict file (`--weights`, see models/torch_port.py) and warns + falls
back to random init when none is given.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["get_namebrand_model", "MODEL_FAMILIES", "input_size_for"]

MODEL_FAMILIES = (
    "inception_v3", "alexnet", "squeezenet",
    "vgg11", "vgg13", "vgg16", "vgg19",
    "vgg11_bn", "vgg13_bn", "vgg16_bn", "vgg19_bn",
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "densenet121", "densenet161", "densenet169", "densenet201",
    "efficientnet_b0", "efficientnet_b1", "efficientnet_b2", "efficientnet_b3",
    "efficientnet_b4", "efficientnet_b5", "efficientnet_b6", "efficientnet_b7",
)


def input_size_for(model_name: str) -> int:
    """The reference's input-size rule: 299 iff inception_v3 else 224
    (neuston_data.py:344). EfficientNets keep 224 for consistency with it."""
    return 299 if model_name == "inception_v3" else 224


def get_namebrand_model(model_name: str, num_o_classes: int, pretrained: bool = False,
                        dtype=jnp.float32, fold_bn: bool = False):
    """name → flax Module with an `num_classes`-way head.

    Mirrors neuston_models.py:22-45 dispatch (same names, same head surgery
    semantics — the returned module's final layer is sized to the dataset).
    Raises KeyError for unknown names, like the reference (:44).

    fold_bn=True builds the eval-only inference variant whose BatchNorms are
    pre-folded into conv kernels/biases (see models/fold.py for the param
    transform + the families that support it).
    """
    if fold_bn:
        from .fold import supports_fold
        if not supports_fold(model_name):
            raise ValueError(f"fold_bn unsupported for {model_name!r}")
    if model_name == "inception_v3":
        from .inception import InceptionV3
        return InceptionV3(num_classes=num_o_classes, aux_logits=True,
                           transform_input=bool(pretrained), dtype=dtype,
                           fold=fold_bn)
    elif model_name == "alexnet":
        from .alexnet import AlexNet
        return AlexNet(num_classes=num_o_classes, dtype=dtype)
    elif model_name == "squeezenet":
        from .squeezenet import SqueezeNet11
        return SqueezeNet11(num_classes=num_o_classes, dtype=dtype)
    elif model_name.startswith("vgg"):
        from .vgg import VGG, VGG_CFGS
        depth = model_name.replace("_bn", "")
        if depth not in VGG_CFGS:
            raise KeyError("model unknown!")
        return VGG(cfg=depth, batch_norm=model_name.endswith("_bn"),
                   num_classes=num_o_classes, dtype=dtype, fold=fold_bn)
    elif model_name.startswith("resnet"):
        from .resnet import ResNet, RESNET_CFGS
        if model_name not in RESNET_CFGS:
            raise KeyError("model unknown!")
        return ResNet(variant=model_name, num_classes=num_o_classes,
                      dtype=dtype, fold=fold_bn)
    elif model_name.startswith("densenet"):
        from .densenet import DenseNet, DENSENET_CFGS
        if model_name not in DENSENET_CFGS:
            raise KeyError("model unknown!")
        return DenseNet(variant=model_name, num_classes=num_o_classes, dtype=dtype)
    elif model_name.startswith("efficientnet"):
        from .efficientnet import EfficientNet, EFFICIENTNET_CFGS
        if model_name not in EFFICIENTNET_CFGS:
            raise KeyError("model unknown!")
        return EfficientNet(variant=model_name, num_classes=num_o_classes,
                            dtype=dtype, fold=fold_bn)
    else:
        raise KeyError("model unknown!")
