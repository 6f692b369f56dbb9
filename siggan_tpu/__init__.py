"""siggan_tpu — TPU-native signature-GAN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``Nobita421/signature-Gan`` reference (a PyTorch DCGAN application for
64x64/128x128 grayscale handwritten-signature synthesis): device-side
preprocessing, fused adversarial train step, data-parallel training over a
``jax.sharding.Mesh``, checkpoint/resume, batched inference, FID/LPIPS/stroke
evaluation, a Siamese signature verifier, an ablation harness, and serving.

This is NOT a port: models are pure functions over pytrees, randomness is
explicit key-threading, the D+G adversarial update is one jitted train step,
and parallelism is GSPMD sharding over ICI instead of host-side loops.
"""

__version__ = "0.1.0"
