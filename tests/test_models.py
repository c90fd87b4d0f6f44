"""Model zoo: forward shapes, parameter counts, dropout twins, registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ursabench_tpu import models
from ursabench_tpu.inference.engine import init_variables
from ursabench_tpu.util import tree_size

CASES = [
    # (name, input_shape, num_classes, exact_param_count or None)
    ("MLP200MNIST", (28, 28, 1), 10, 199210),
    ("MLP400MNIST", (28, 28, 1), 10, 478410),
    ("LeNet5MNIST", (28, 28, 1), 10, 61706),
    # hand-counted from the reference architecture (conv+bn-affine+linear);
    # the oft-quoted 272,474 additionally counts BN running buffers
    ("ResNet20", (32, 32, 3), 10, 269722),
    ("ResNet56", (32, 32, 3), 10, 853018),
    ("PreResNet8", (32, 32, 3), 10, None),
    ("PreResNet20", (32, 32, 3), 10, None),
    ("PreResNet56", (32, 32, 3), 10, None),  # bottleneck variant
    ("PreResNet110", (32, 32, 3), 100, None),
    ("WideResNet28x10", (32, 32, 3), 10, 36489290),
    ("INResNet18", (32, 32, 3), 10, 11173962),
    ("INResNet50", (32, 32, 3), 10, 23520842),
    # true-stem torchvision architecture (trtprof's 224^2 engine source,
    # to_onnx.py:37): exact torchvision.models.resnet{18,50}() counts.
    # Param counts are input-size independent; 64^2 keeps CPU init cheap.
    ("TVResNet18", (64, 64, 3), 1000, 11689512),
    ("TVResNet50", (64, 64, 3), 1000, 25557032),
]


@pytest.mark.parametrize("name,shape,classes,count", CASES,
                         ids=[c[0] for c in CASES])
def test_forward_shape_and_params(name, shape, classes, count):
    cfg = models.get_model(name)
    module = cfg.build(classes)
    variables = init_variables(module, jax.random.PRNGKey(0), shape)
    x = jnp.zeros((2,) + shape, jnp.float32)
    rngs = {"dropout": jax.random.PRNGKey(1)}
    logits = module.apply(variables, x, train=False, rngs=rngs)
    assert logits.shape == (2, classes)
    n_params = tree_size(variables["params"])
    if count is not None:
        assert n_params == count, f"{name}: {n_params} != {count}"
    else:
        assert n_params > 1000

    # train-mode apply works and (for BN models) mutates batch_stats
    xr = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    out, mutated = module.apply(
        variables, xr, train=True, mutable=["batch_stats"], rngs=rngs
    )
    assert out.shape == (2, classes)
    if variables.get("batch_stats"):
        changed = any(
            not np.allclose(np.asarray(b), np.asarray(a))
            for b, a in zip(
                jax.tree.leaves(variables["batch_stats"]),
                jax.tree.leaves(mutated["batch_stats"]),
            )
        )
        assert changed


def test_dropout_twins_resolve():
    for base in ("MLP200MNIST", "WideResNet28x10"):
        twin = models.dropout_twin(base)
        module = twin.build(10)
        variables = init_variables(
            module, jax.random.PRNGKey(0),
            (28, 28, 1) if "MLP" in base else (32, 32, 3),
        )
        x = jnp.zeros((2,) + ((28, 28, 1) if "MLP" in base else (32, 32, 3)))
        # dropout active at eval: two different rngs -> different outputs
        a = module.apply(variables, x + 1.0, train=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        b = module.apply(variables, x + 1.0, train=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(a), np.asarray(b))


def test_registry_contents():
    names = set(models.list_models())
    expected = {
        "MLP200MNIST", "MLP400MNIST", "MLP600MNIST", "MLP200MNIST_dropout",
        "ResNet20", "ResNet32", "ResNet44", "ResNet56", "ResNet110", "ResNet1202",
        "PreResNet8", "PreResNet20", "PreResNet56", "PreResNet83",
        "PreResNet110", "PreResNet164",
        "WideResNet28x10", "WideResNet28x10_dropout", "WideResNet_dropout",
        "INResNet18", "INResNet34", "INResNet50", "INResNet101", "INResNet152",
        "TVResNet18", "TVResNet50", "TVResNet50_dropout",
        "ResNet_dropout", "LeNet5MNIST",
    }
    assert expected <= names


def test_tvresnet_s2d_stem_is_exact():
    """TVResNet's space-to-depth stem (the one measured rewrite win from
    the rn50 lowering probe) is mathematically identical to the direct
    7x7/2 conv: same param tree (torchvision kernel shape preserved), same
    logits, same gradients, on even AND odd (fallback path) input sizes."""
    from ursabench_tpu.models.resnet_imagenet import TVResNet

    for h in (64, 63):
        a = TVResNet(layers=(2, 2, 2, 2), bottleneck=False, num_classes=7,
                     stem_s2d=True)
        b = TVResNet(layers=(2, 2, 2, 2), bottleneck=False, num_classes=7,
                     stem_s2d=False)
        va = init_variables(a, jax.random.PRNGKey(0), (h, h, 3))
        vb = init_variables(b, jax.random.PRNGKey(0), (h, h, 3))
        # identical param trees: the s2d stem keeps the (7,7,3,64) kernel
        assert jax.tree.structure(va["params"]) == jax.tree.structure(
            vb["params"])
        for la, lb in zip(jax.tree.leaves(va["params"]),
                          jax.tree.leaves(vb["params"])):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        x = jax.random.normal(jax.random.PRNGKey(3), (2, h, h, 3))
        ya = a.apply(va, x, train=False)
        yb = b.apply(vb, x, train=False)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=1e-4, atol=1e-4)

        def loss(fn, v):
            return lambda p: jnp.sum(
                fn.apply({**v, "params": p}, x, train=False) ** 2)

        ga = jax.grad(loss(a, va))(va["params"])
        gb = jax.grad(loss(b, vb))(vb["params"])
        for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-3, atol=2e-3)
