"""Mesh parallelism on the 8-virtual-device CPU platform."""

import jax
import numpy as np

from ursabench_tpu import data, inference, models
from ursabench_tpu.parallel import chain_mesh, make_mesh


def test_chain_mesh_shapes():
    mesh = chain_mesh(chains=4)
    assert mesh.shape["chain"] == 4
    mesh2 = chain_mesh(chains=3)  # 3 chains on 8 devices -> 3-device mesh
    assert mesh2.shape["chain"] == 3


def test_mesh_sharded_sghmc_chains():
    splits, C = data.loaders(
        "MNIST", None, batch_size=32, use_validation=False,
        synthetic_n_train=128, synthetic_n_test=64,
    )
    module = models.get_model("MLP200MNIST").build(C)
    mesh = chain_mesh(chains=4)
    s = inference.SGHMC(
        {"lr": 0.03, "prior_std": 1.0, "num_samples": 2, "alpha": 0.1,
         "burn_in_epochs": 1},
        model=module, train=splits["train"], key=jax.random.PRNGKey(0),
        chains=4, mesh=mesh,
    )
    # chain state is actually sharded over devices
    leaf = jax.tree.leaves(s._state.params)[0]
    assert len(leaf.sharding.device_set) == 4
    ens = s.sample()
    assert ens.num_members == 8  # 2 draws x 4 chains
    p = jax.tree.leaves(ens.params)[0]
    # all chains differ
    for i in range(1, 4):
        assert not np.allclose(np.asarray(p[0]), np.asarray(p[i]))


def test_make_mesh_two_axes():
    mesh = make_mesh(8)
    assert mesh.shape["chain"] * mesh.shape["data"] == 8
