"""Pure-torch AlexNet / DenseNet / SqueezeNet1.1 / EfficientNet / VGG with
EXACT torchvision module names (state_dict key-compatible) — shims over
ifcb_classifier_tpu/models/torch_zoo.py; see tools/torch_inception_tv.py
for the rationale."""

from ifcb_classifier_tpu.models.torch_zoo import (  # noqa: F401
    AlexNet, DenseNet, EfficientNet, SqueezeNet11, VGG)


def DenseNet121(num_classes=5):
    return DenseNet("densenet121", num_classes)


def EfficientNetB0(num_classes=5):
    return EfficientNet("efficientnet_b0", num_classes)


def VGG11(num_classes=5):
    return VGG("vgg11", num_classes)
