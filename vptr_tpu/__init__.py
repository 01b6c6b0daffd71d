"""vptr_tpu — a TPU-native JAX video-prediction framework.

A ground-up rebuild of the capabilities of XiYe20/VPTR (ICPR 2022) as an
idiomatic JAX/Flax/XLA stack:

* Stage 1: ResNet conv autoencoder (+PatchGAN discriminator) mapping 64x64
  frames to 8x8 latent feature maps.
* Stage 2: VidHRFormer latent transformer with local-window spatial attention
  (optionally with Swin-style relative position bias) and factored temporal
  attention, in FAR (fully-autoregressive) and NAR (non-autoregressive)
  variants.
* Criterion: MSE/L1/GDL/GAN(vanilla|lsgan|wgangp)/BiPatchNCE + Noam schedule.
* Eval: PSNR/SSIM/MSE/LPIPS + per-timestep curves + lax.scan rollouts.
* Data: MovingMNIST npz, KTH/BAIR frame folders, per-clip transforms.
* Parallelism: jax.sharding Mesh (data + model axes) with GSPMD collectives.

Everything is channels-last (N, T, H, W, C), statically shaped, and jit-first.
Reference behaviors are cited inline as ``reference: <file>:<lines>`` pointing
into the upstream PyTorch repo.
"""

__version__ = "0.1.0"

from vptr_tpu.config import (  # noqa: F401
    AutoencoderConfig,
    DataConfig,
    DiscriminatorConfig,
    ExperimentConfig,
    OptimConfig,
    TransformerConfig,
    get_preset,
    list_presets,
)
