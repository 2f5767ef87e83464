"""sbmc_tpu: TPU-native sample-based Monte-Carlo denoising framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of adobe/sbmc
(Gharbi et al., SIGGRAPH 2019), designed TPU-first:

- ``sbmc_tpu.ops``: the splat/gather compute kernels (Pallas TPU kernels with a
  pure-XLA oracle), replacing the reference's Halide CPU/CUDA generators
  (reference: src/kernel_weighting.cpp, src/scatter2gather.cpp).
- ``sbmc_tpu.nn``: conv stacks, U-Net and the progressive (online-softmax)
  kernel accumulator (reference: sbmc/modules.py).
- ``sbmc_tpu.models``: the ``Multisteps`` sample-based denoiser and the
  ``KPCN`` per-pixel baseline (reference: sbmc/models.py).
- ``sbmc_tpu.data``: bit-accurate ``.bin`` sample-tile IO and dataset classes
  (reference: sbmc/datasets.py).
- ``sbmc_tpu.train``: losses, data-parallel train step, checkpointing
  (reference: sbmc/interfaces.py + ttools).
- ``sbmc_tpu.parallel``: device-mesh helpers and overlap-tiled multi-chip
  inference (reference: scripts/denoise.py tiling).
"""

__version__ = "0.1.0"

from sbmc_tpu import ops  # noqa: F401
from sbmc_tpu import losses  # noqa: F401
from sbmc_tpu.nn import (  # noqa: F401
    ConvChain,
    Autoencoder,
    KernelApply,
    ProgressiveKernelApply,
)
from sbmc_tpu.models import Multisteps, KPCN  # noqa: F401



