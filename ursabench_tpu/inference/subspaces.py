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
import numpy as np


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


def minka_log_evidence(spectrum, rank, n_features, n_samples):
    """Minka's PCA marginal log-evidence for a tested rank (Minka,
    "Automatic choice of dimensionality for PCA", NIPS 2000, eqs. 27-31),
    with the sklearn-0.20 ``_assess_dimension_`` conventions the reference
    pins (reference subspaces.py:12-14,135-154): rank ranges 0..len(spectrum),
    residual variance v from the tail of the spectrum (v=1, pv=0 when
    rank == n_features), and pp carries the (m + rank + 1)/2 factor of that
    era. Degenerate spectra (log of <= 0) yield nan, skipped by nanargmax.

    Host-side numpy on a K<=max_rank spectrum: a scalar double loop of ~K^2
    iterations run once per subspace build has no business on the MXU.
    """
    from scipy.special import gammaln

    spectrum = np.asarray(spectrum, np.float64)
    k = int(rank)
    n = float(n_samples)
    d = float(n_features)

    with np.errstate(divide="ignore", invalid="ignore"):
        i = np.arange(1, k + 1, dtype=np.float64)
        pu = -k * np.log(2.0) + np.sum(
            gammaln((d - i + 1.0) / 2.0) - np.log(np.pi) * (d - i + 1.0) / 2.0
        )
        pl = -n / 2.0 * np.sum(np.log(spectrum[:k]))
        if k == n_features:
            v, pv = 1.0, 0.0
        else:
            v = np.sum(spectrum[k:]) / (d - k)
            pv = -np.log(v) * n * (d - k) / 2.0
        m = d * k - k * (k + 1.0) / 2.0
        pp = np.log(2.0 * np.pi) * (m + k + 1.0) / 2.0

        spectrum_tail = spectrum.copy()
        spectrum_tail[k:n_features] = v
        pa = 0.0
        for a in range(k):
            for b in range(a + 1, len(spectrum)):
                pa += np.log(
                    (spectrum[a] - spectrum[b])
                    * (1.0 / spectrum_tail[b] - 1.0 / spectrum_tail[a])
                ) + np.log(n)

        return float(pu + pl + pv + pp - pa / 2.0 - k * np.log(n) / 2.0)


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
        if self.pca_rank == "mle":
            # Minka-MLE rank selection (reference subspaces.py:135-154):
            # evidence over the full collected spectrum plus the reference's
            # BIC-style degrees-of-freedom correction, argmax over ranks.
            s, sv = _gram_svd(a, self.rank)
            eigs = np.asarray(s, np.float64) ** 2.0
            n_rows, n_cols = a.shape  # (K deviation vectors, P parameters)
            n_feat = min(n_rows, n_cols)
            n_samp = max(n_rows, n_cols)
            ll = np.array([
                minka_log_evidence(eigs, r, n_feat, n_samp)
                for r in range(len(eigs))
            ])
            ranks = np.arange(len(eigs), dtype=np.float64)
            correction = 0.5 * (
                n_cols * ranks - ranks * (ranks + 1.0) / 2.0
            ) * np.log(n_rows)
            self.ll = ll
            self.corrected_ll = ll - correction
            # the reference takes a bare nanargmax (subspaces.py:152); rank 0
            # would return an empty subspace, so clamp to >= 1
            self.pca_rank = max(1, int(np.nanargmax(self.corrected_ll)))
            return sv[: self.pca_rank]
        pca_rank = max(1, min(self.pca_rank, self.rank))
        _, sv = _gram_svd(a, pca_rank)
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
