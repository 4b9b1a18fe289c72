"""unet_design_tpu: a TPU-native (JAX/XLA/Pallas/pjit) U-Net design framework.

One unified stack with the capabilities of the four sub-repositories of
FabianFalck/unet-design ("A Unified Framework for U-Net Design and Analysis",
NeurIPS 2023):

- ``diff_mnist``  — DDPM generative modeling on MNIST / MNIST-Triangular / CelebA
- ``diff_cifar``  — DDPM on CIFAR-10 with FID/IS evaluation
- ``pdearena``    — PDE surrogate learning (Navier-Stokes 2D, Shallow water 2D)
- ``wmh``         — White-Matter-Hyperintensity MRI segmentation

Design decisions (TPU-first, not a port):

- **NHWC layout everywhere.**  Feature maps are ``(B, H, W, C)`` (the reference is
  NCHW).  PDE trajectories are ``(B, T, H, W, C)`` and are collapsed to
  ``(B, H, W, T*C)`` at model entry.
- **Functional models** (flax.linen) with explicitly threaded params; staged
  training / freezing is expressed as optax parameter-label masking instead of
  ``requires_grad`` mutation.
- **Samplers and rollouts are ``lax.scan`` loops** compiled once, instead of
  Python loops around the model.
- **Static ``n_levels_used``**: one compiled graph per stage (<= n_levels graphs).
- **bf16 compute / fp32 params + fp32 GroupNorm statistics** by default on TPU.
- **Parallelism via ``jax.sharding.Mesh``** (data/model axes) — the reference's
  DataParallel / Lightning-DDP becomes batch sharding + XLA collectives.
"""

__version__ = "0.1.0"

from unet_design_tpu.ops import wavelet  # noqa: F401
