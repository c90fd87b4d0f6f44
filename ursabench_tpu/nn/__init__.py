from .init import (
    torch_linear_kernel_init,
    torch_linear_bias_init,
    kaiming_normal_init,
    fan_out_normal_init,
)

__all__ = [
    "torch_linear_kernel_init",
    "torch_linear_bias_init",
    "kaiming_normal_init",
    "fan_out_normal_init",
]
