"""Data normalizers — parity with the reference benchmark utilities
(reference ``benchmarks/04-.../utils/normalizer.py``)."""

from __future__ import annotations

import numpy as np


class IdentityTransformer:
    """reference normalizer.py: stats kept, encode/decode are identity."""

    def __init__(self, x):
        x = np.asarray(x)
        self.mean = x.mean(axis=0, keepdims=True)
        self.std = x.std(axis=0, keepdims=True, ddof=1) + 1e-8

    def encode(self, x):
        return x

    def decode(self, x):
        return x


class UnitTransformer:
    """Pointwise standardization over (batch, points) axes
    (reference ``normalizer.py`` UnitTransformer; torch ``std`` is the
    unbiased estimator, replicated with ``ddof=1``)."""

    def __init__(self, x):
        x = np.asarray(x)
        self.mean = x.mean(axis=(0, 1), keepdims=True)
        self.std = x.std(axis=(0, 1), keepdims=True, ddof=1) + 1e-8

    def encode(self, x):
        return (x - self.mean) / self.std

    def decode(self, x):
        return x * self.std + self.mean


class UnitGaussianNormalizer:
    """Per-location standardization over the batch axis
    (reference ``normalizer.py`` UnitGaussianNormalizer)."""

    def __init__(self, x, eps: float = 1e-5):
        x = np.asarray(x)
        self.mean = x.mean(axis=0)
        self.std = x.std(axis=0, ddof=1)
        self.eps = eps

    def encode(self, x):
        return (x - self.mean) / (self.std + self.eps)

    def decode(self, x, sample_idx=None):
        std = self.std + self.eps
        mean = self.mean
        if sample_idx is not None:
            std = std[sample_idx]
            mean = mean[sample_idx]
        return x * std + mean


class StreamingNormalizer:
    """Streaming per-feature mean/std over a sample iterator — the
    ShapeNet-Car pipeline's normalization (reference
    ``benchmarks/02-.../dataset/dataset.py:243-288``) without loading the
    whole dataset in memory."""

    def __init__(self, n_features: int):
        self.n = 0
        self.mean = np.zeros(n_features, dtype=np.float64)
        self.m2 = np.zeros(n_features, dtype=np.float64)

    def update(self, x):
        """x: [num_points, n_features] (Chan et al. parallel merge)."""
        x = np.asarray(x, dtype=np.float64)
        cnt = x.shape[0]
        row_mean = x.mean(0)
        row_m2 = ((x - row_mean) ** 2).sum(0)
        delta = row_mean - self.mean
        tot = self.n + cnt
        self.mean += delta * cnt / tot
        self.m2 += row_m2 + delta ** 2 * self.n * cnt / tot
        self.n = tot

    @property
    def std(self):
        return np.sqrt(self.m2 / max(self.n - 1, 1)) + 1e-8

    def encode(self, x):
        return (np.asarray(x) - self.mean) / self.std

    def decode(self, x):
        return np.asarray(x) * self.std + self.mean
