"""Weight initializers matching the PyTorch conventions used by the
reference model zoo, expressed as flax/jax initializer functions.

Reference init behaviors reproduced:
- torch ``nn.Linear``/``nn.Conv2d`` default: kaiming_uniform(a=sqrt(5)) =>
  U(-sqrt(1/fan_in), sqrt(1/fan_in)); bias U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
- ``init.kaiming_normal_``: N(0, sqrt(2/fan_in))
  (/root/reference/URSABench/models/resnet.py:11-14,
   /root/reference/URSABench/models/imagenet_resnet.py:10-13).
- PreResNet custom: N(0, sqrt(2/(kh*kw*out_channels))) i.e. fan-out scaling
  (/root/reference/URSABench/models/preresnet.py:114-117).
"""

import jax.numpy as jnp
from jax import nn as jnn
from jax import random

# U(-sqrt(1/fan_in), sqrt(1/fan_in)): variance_scaling uniform draws
# U(-l, l) with l = sqrt(3*scale/fan); scale=1/3 gives l = sqrt(1/fan_in).
torch_linear_kernel_init = jnn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)

kaiming_normal_init = jnn.initializers.variance_scaling(2.0, "fan_in", "normal")

# PreResNet: std = sqrt(2 / (kh*kw*cout)) -> fan_out scaled normal.
fan_out_normal_init = jnn.initializers.variance_scaling(2.0, "fan_out", "normal")


def torch_linear_bias_init(fan_in: int):
    """torch Linear/Conv bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init
