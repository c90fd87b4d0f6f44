"""Weight-space subspace constructions.

Parity target: /root/reference/URSABench/inference/subspaces.py —
RandomSpace (dense Gaussian projection, :46-68), CovarianceSpace (FIFO
deviation matrix of rank <= max_rank, :71-100), PCASpace (truncated SVD of
the deviation matrix, :103-156), FreqDirSpace (frequent-directions sketch,
:159-189).

TPU-native detail: the PCA never forms a P-sided SVD. For A of shape (K, P)
with K <= max_rank (tiny) we eigendecompose the K x K Gram matrix A A^T and
recover cov_factor = S Vt = U^T A — one small eigh + one (K,K)x(K,P) matmul
on the MXU, identical result to sklearn's randomized_svd up to sign
(SURVEY.md §7 hard-parts list).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Subspace:
    subclasses: dict = {}

    @classmethod
    def register_subclass(cls, name):
        def deco(sub):
            cls.subclasses[name] = sub
            return sub

        return deco

    @classmethod
    def create(cls, subspace_type, **kwargs):
        if subspace_type not in cls.subclasses:
            raise ValueError(f"Bad subspaces type {subspace_type}")
        return cls.subclasses[subspace_type](**kwargs)

    def collect_vector(self, vector: jnp.ndarray):
        raise NotImplementedError

    def get_space(self) -> jnp.ndarray:
        raise NotImplementedError


@Subspace.register_subclass("random")
class RandomSpace(Subspace):
    def __init__(self, num_parameters, rank=20, method="dense", key=None):
        assert method == "dense", "fastfood not implemented (parity: subspaces.py:61)"
        self.num_parameters = num_parameters
        self.rank = rank
        key = key if key is not None else jax.random.PRNGKey(0)
        self.subspace = jax.random.normal(key, (rank, num_parameters))

    def collect_vector(self, vector):
        pass  # independent of data

    def get_space(self):
        return self.subspace


@Subspace.register_subclass("covariance")
class CovarianceSpace(Subspace):
    def __init__(self, num_parameters, max_rank=20):
        self.num_parameters = num_parameters
        self.max_rank = max_rank
        self.rank = 0
        self.cov_mat_sqrt = jnp.zeros((0, num_parameters), jnp.float32)

    def collect_vector(self, vector):
        if self.rank + 1 > self.max_rank:
            self.cov_mat_sqrt = self.cov_mat_sqrt[1:]  # FIFO (subspaces.py:86-88)
        self.cov_mat_sqrt = jnp.concatenate(
            [self.cov_mat_sqrt, vector.reshape(1, -1)], axis=0
        )
        self.rank = min(self.rank + 1, self.max_rank)

    def get_space(self):
        return self.cov_mat_sqrt / (self.cov_mat_sqrt.shape[0] - 1) ** 0.5


def _gram_svd(a: jnp.ndarray, k: int):
    """Top-k singular values/right-factor of (K,P) via the K x K Gram."""
    gram = a @ a.T  # (K, K)
    w, u = jnp.linalg.eigh(gram)  # ascending
    w = w[::-1]
    u = u[:, ::-1]
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    sv = (u.T @ a)[:k]  # rows are s_i * v_i^T
    return s[:k], sv


@Subspace.register_subclass("pca")
class PCASpace(CovarianceSpace):
    def __init__(self, num_parameters, pca_rank=20, max_rank=20):
        super().__init__(num_parameters, max_rank=max_rank)
        assert pca_rank == "mle" or isinstance(pca_rank, int)
        if pca_rank != "mle":
            assert 1 <= pca_rank <= max_rank
        self.pca_rank = pca_rank

    def get_space(self):
        a = self.cov_mat_sqrt / (max(1, self.rank - 1)) ** 0.5
        pca_rank = self.rank if self.pca_rank == "mle" else self.pca_rank
        pca_rank = max(1, min(pca_rank, self.rank))
        _, sv = _gram_svd(a, pca_rank)
        # (The reference's 'mle' path uses a deprecated sklearn-private Minka
        # estimator, subspaces.py:135-154; we use the full collected rank.)
        return sv


@Subspace.register_subclass("freq_dir")
class FreqDirSpace(CovarianceSpace):
    def __init__(self, num_parameters, max_rank=20):
        super().__init__(num_parameters, max_rank=max_rank)
        self.num_models = 0
        self.delta = 0.0
        self.normalized = False

    def collect_vector(self, vector):
        if self.cov_mat_sqrt.shape[0] >= 2 * self.max_rank:
            sketch = self.cov_mat_sqrt
            k = min(sketch.shape)
            s, sv = _gram_svd(sketch, k)
            if s.shape[0] >= self.max_rank:
                current_delta = s[self.max_rank - 1] ** 2
                self.delta += float(current_delta)
                s_shrunk = jnp.sqrt(
                    jnp.maximum(s[: self.max_rank - 1] ** 2 - current_delta, 0.0)
                )
                v = sv[: self.max_rank - 1] / jnp.maximum(
                    s[: self.max_rank - 1, None], 1e-30
                )
                self.cov_mat_sqrt = s_shrunk[:, None] * v
            else:
                self.cov_mat_sqrt = sv
        self.cov_mat_sqrt = jnp.concatenate(
            [self.cov_mat_sqrt, vector.reshape(1, -1)], axis=0
        )
        self.rank = self.cov_mat_sqrt.shape[0]
        self.num_models += 1
        self.normalized = False

    def get_space(self):
        if not self.normalized:
            k = min(self.cov_mat_sqrt.shape)
            _, sv = _gram_svd(self.cov_mat_sqrt, k)
            self.cov_mat_sqrt = sv
            self.normalized = True
        curr = min(self.rank, self.max_rank)
        return self.cov_mat_sqrt[:curr] / max(1, self.num_models - 1) ** 0.5


class SubspaceModel:
    """theta (rank,) -> full weight vector: mean + cov_factor^T theta
    (projection_model.py:6-14)."""

    def __init__(self, mean: jnp.ndarray, cov_factor: jnp.ndarray):
        self.mean = mean
        self.cov_factor = cov_factor
        self.rank = cov_factor.shape[0]

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.mean + self.cov_factor.T @ t
