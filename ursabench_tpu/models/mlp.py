"""3-layer MLPs (MLP200/400/600 MNIST) + dropout twin.

Parity target: /root/reference/URSABench/models/mlp.py:8-70. Note the
reference's dropout twin calls ``F.dropout`` with default training=True so
dropout stays active at eval (mlp.py:39-40) — reproduced here by always
sampling dropout when a 'dropout' rng is provided.
"""

import flax.linen as nn

from ..data.transforms import MNIST_TEST, MNIST_TRAIN
from ..nn.init import torch_linear_bias_init, torch_linear_kernel_init
from .common import ModelCfg, register


def _dense(features: int, fan_in: int, dtype=None) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=torch_linear_kernel_init,
        bias_init=torch_linear_bias_init(fan_in),
        dtype=dtype,
    )


class MLP(nn.Module):
    hidden_size: int
    input_dim: int
    num_classes: int
    dropout: float = 0.0
    dtype: object = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = x.reshape((-1, self.input_dim))
        x = _dense(self.hidden_size, self.input_dim, d)(x)
        if self.dropout > 0:
            # reference applies dropout *before* relu (mlp.py:39)
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        x = _dense(self.hidden_size, self.hidden_size, d)(nn.relu(x))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        x = _dense(self.num_classes, self.hidden_size, d)(nn.relu(x))
        return x


def _mlp_cfg(name: str, hidden: int, dropout: float = 0.0) -> ModelCfg:
    return register(
        ModelCfg(
            name=name,
            make=lambda num_classes, **kw: MLP(num_classes=num_classes, **kw),
            transform_train=MNIST_TRAIN,
            transform_test=MNIST_TEST,
            kwargs={"hidden_size": hidden, "input_dim": 784, "dropout": dropout},
        )
    )


MLP200MNIST = _mlp_cfg("MLP200MNIST", 200)
MLP400MNIST = _mlp_cfg("MLP400MNIST", 400)
MLP600MNIST = _mlp_cfg("MLP600MNIST", 600)
MLP200MNIST_dropout = _mlp_cfg("MLP200MNIST_dropout", 200, dropout=0.2)
