from .layers import (
    Conv,
    torch_conv_kernel_init,
    torch_conv_bias_init,
    GroupNorm32,
    swish,
    Upsample,
    Downsample,
    ResnetBlock,
    AttnBlock,
    ResBlockGN,
)

__all__ = [
    "Conv",
    "torch_conv_kernel_init",
    "torch_conv_bias_init",
    "GroupNorm32",
    "swish",
    "Upsample",
    "Downsample",
    "ResnetBlock",
    "AttnBlock",
    "ResBlockGN",
]
