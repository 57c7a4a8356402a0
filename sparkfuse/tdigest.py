"""Mergeable t-digest quantile sketch (north_rule family; Dunning & Ertl,
"Computing Extremely Accurate Quantiles Using t-Digests", arXiv:1902.04023).

Merging-digest variant: a digest is a sorted list of (mean, weight)
centroids whose sizes obey the k1 scale function
    k(q) = (delta / 2π) · asin(2q − 1)
so clusters are fine near the tails (q→0,1) and coarse in the middle —
rank error is O(q(1−q)/delta). Merge = concatenate + one compress pass:
associative up to re-compression (accuracy-, not byte-, stable), the
standard t-digest contract; exact min/max are carried for tail
interpolation.

Distributed build follows the sketch plan shape (PLANS.md §6): one
mapInPandas pass builds per-partition digests, a bucketed applyInPandas
layer tree-merges them, the driver merges the handful of survivors. Only
centroid states (KB) ever move.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass
import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfuse.sketches import _tree_build


@dataclass
class TDigestParams:
    delta: float = 200.0  # compression: ~2*delta centroids retained


class TDigest:
    def __init__(self, params: TDigestParams | None = None,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None,
                 vmin: float = math.inf, vmax: float = -math.inf):
        # no shared mutable default instance (round-5 ADVICE)
        self.params = params or TDigestParams()
        self.means = means if means is not None else np.empty(0)
        self.weights = weights if weights is not None else np.empty(0)
        self.min = vmin
        self.max = vmax

    # -- core ---------------------------------------------------------------

    @staticmethod
    def _k(q: np.ndarray, delta: float) -> np.ndarray:
        return delta / (2 * math.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        if total == 0:
            return
        out_m: list[float] = []
        out_w: list[float] = []
        delta = self.params.delta
        cur_m, cur_w = means[0], weights[0]
        cum = 0.0  # weight before current cluster
        k_lo = self._k(np.array([0.0]), delta)[0]
        for m, w in zip(means[1:], weights[1:]):
            q_hi = (cum + cur_w + w) / total
            if self._k(np.array([q_hi]), delta)[0] - k_lo <= 1.0:
                cur_m += (m - cur_m) * (w / (cur_w + w))
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                k_lo = self._k(np.array([cum / total]), delta)[0]
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        # pre-cluster the batch to bound compress cost: sort + chunk
        v.sort(kind="stable")
        # seed clusters of ~batch/4delta so compress sees O(delta) inputs
        n_chunks = max(1, min(len(v), int(4 * self.params.delta)))
        chunks = np.array_split(v, n_chunks)
        bm = np.array([c.mean() for c in chunks if len(c)])
        bw = np.array([float(len(c)) for c in chunks if len(c)])
        self._compress(np.concatenate([self.means, bm]),
                       np.concatenate([self.weights, bw]))

    def merge(self, other: "TDigest") -> "TDigest":
        assert self.params == other.params
        out = TDigest(self.params,
                      vmin=min(self.min, other.min),
                      vmax=max(self.max, other.max))
        out._compress(np.concatenate([self.means, other.means]),
                      np.concatenate([self.weights, other.weights]))
        return out

    @property
    def n(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return math.nan
        if len(self.means) == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        # centroid centers at cumulative midpoints
        cum = np.cumsum(self.weights) - self.weights / 2
        if target <= cum[0]:
            # interpolate from exact min
            f = target / cum[0] if cum[0] > 0 else 0.0
            return float(self.min + f * (self.means[0] - self.min))
        if target >= cum[-1]:
            span = total - cum[-1]
            f = (target - cum[-1]) / span if span > 0 else 0.0
            return float(self.means[-1] + f * (self.max - self.means[-1]))
        i = np.searchsorted(cum, target) - 1
        f = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + f * (self.means[i + 1] - self.means[i]))

    # -- serialization ------------------------------------------------------

    def to_bytes(self) -> bytes:
        head = struct.pack("<ddI", self.min, self.max, len(self.means))
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, params: TDigestParams, data: bytes) -> "TDigest":
        vmin, vmax, k = struct.unpack_from("<ddI", data, 0)
        off = struct.calcsize("<ddI")
        means = np.frombuffer(data, dtype=np.float64, count=k, offset=off).copy()
        weights = np.frombuffer(
            data, dtype=np.float64, count=k, offset=off + 8 * k
        ).copy()
        return cls(params, means, weights, vmin, vmax)


def build_tdigest(
    values_df: DataFrame, value_col: str = "value",
    params: TDigestParams | None = None, fanout: int = 16,
) -> TDigest:
    """Distributed mergeable t-digest (partial per partition → tree merge);
    shares the sketch tree-merge plan in sketches._tree_build."""
    params = params or TDigestParams()
    values_df = values_df.select(F.col(value_col).cast("double").alias("value"))
    return _tree_build(
        values_df,
        "value",
        make=lambda: TDigest(params),
        add=lambda s, v: s.add(v),
        merge=lambda a, b: a.merge(b),
        to_bytes=lambda s: s.to_bytes(),
        from_bytes=lambda b: TDigest.from_bytes(params, b),
        fanout=fanout,
    )
