"""Minimal torchvision shim for running the PyTorch reference in-env.

The build environment has torch but NOT torchvision; the reference pipeline
(`/root/reference/src/data_loader_signatures.py:22`, `utils/visualizer.py:19`)
imports `torchvision.transforms` and `torchvision.utils.make_grid`. This shim
implements exactly that surface with PIL + torch so the reference's OWN
trainer can run unmodified for the parity experiment (BASELINE.md). It is an
original implementation matching torchvision's documented behavior
(defaults: NEAREST resampling for RandomRotation/RandomAffine, BILINEAR for
Resize), not a copy of torchvision.

`torchvision.models` is intentionally absent — the reference's metrics module
treats that as "torchvision not available" and skips FID gracefully
(`evaluate_vanilla_gan_signatures.py:276`), which is fine: the parity
experiment scores BOTH sides with siggan_tpu's own backbone instead.
"""

from . import transforms, utils  # noqa: F401

__version__ = "0.0.0+siggan-shim"
