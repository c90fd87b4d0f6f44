"""Test configuration: force an 8-virtual-device CPU platform so sharding
and multi-chain paths are exercised without TPU hardware (the JAX
fake-multi-device mechanism; see SURVEY.md §4)."""

import os

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon, so env vars set here are too late for jax's config
# snapshot — override through jax.config instead. XLA_FLAGS is still read
# lazily at CPU-backend init, which hasn't happened yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_mnist():
    """Canonical fast fixture mirroring the reference demo notebook's
    100-sample MNIST subset (examples/URSABench_MNIST_demo.ipynb)."""
    from ursabench_tpu import data

    splits, num_classes = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=128, synthetic_n_test=96,
    )
    return splits, num_classes
