from sbmc_tpu.nn.layers import ConvChain, Autoencoder, WNConv2D  # noqa: F401
from sbmc_tpu.nn.kernel_apply import (  # noqa: F401
    KernelApply,
    ProgressiveKernelApply,
    ProgressiveState,
    kernel_apply,
    progressive_kernel_apply,
    progressive_init,
)
