"""Pure-torch ResNet with EXACT torchvision module names (state_dict
key-compatible) — a shim over ifcb_classifier_tpu/models/torch_zoo.py;
see tools/torch_inception_tv.py for the rationale."""

from ifcb_classifier_tpu.models.torch_zoo import (  # noqa: F401
    BasicBlock, Bottleneck, ResNet)


def ResNet18(num_classes=5):
    return ResNet("resnet18", num_classes)
