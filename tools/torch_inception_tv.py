"""Pure-torch Inception-v3 with EXACT torchvision module names, so its
state_dict is key-compatible with torchvision's `inception_v3` weights.

Now a shim over the package's first-party torch zoo
(ifcb_classifier_tpu/models/torch_zoo.py) — the same modules the genuine
`.onnx` exporter traces — so the cross-framework parity tests
(tests/test_torch_parity.py, tests/test_train_dynamics_parity.py) pin the
exporter's forward semantics, not a drifting copy."""

from ifcb_classifier_tpu.models.torch_zoo import (  # noqa: F401
    BasicConv2d, Inception3, InceptionA, InceptionAux, InceptionB,
    InceptionC, InceptionD, InceptionE)
