"""KMV/theta sketch: mergeable set-EXPRESSION cardinality estimates.

HLL answers |A| and |A ∪ B| (register max is a union), but it cannot
estimate |A ∩ B| or |A \\ B| beyond error-amplifying inclusion-exclusion.
The theta sketch keeps the k minimum hash values of a set — a uniform
sample of the set below a threshold theta — and set expressions become
sample arithmetic:

    union:        merge samples, keep k smallest, theta = k-th value
    intersection: theta = min(theta_a, theta_b); count common sample
                  values below theta; estimate = count / (theta/2^64)
    difference:   same, counting values present in a but not b

Relative error ~ 1/sqrt(k-1) per estimate (k=1024 → ~3%).

The pipeline use: estimate overlap between two corpora (train vs
benchmark, two crawls) from two KB-sized artifacts WITHOUT a join — the
triage step before paying for exact decontamination or dedup.

From scratch on numpy (sorted u64 arrays; murmur64 avalanche over
already-xxhash64'd keys, same input convention as the other sketches).
Theta is tracked as an EXCLUSIVE integer bound in the u64 hash space
(python int; float64 would round 64-bit boundaries and make
merge-vs-single-pass membership of boundary hashes inconsistent);
``EXACT`` = 2^64 means nothing has been evicted yet and counts are exact.
Mergeable + serializable, so it rides the sketch tree-build machinery
unchanged.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

from sparkfuse.hashing import murmur64, to_u64

EXACT = 1 << 64  # exclusive theta bound covering the whole hash space


@dataclass
class ThetaParams:
    k: int = 1024  # retained minimum hashes; rel. error ~ 1/sqrt(k-1)


class ThetaSketch:
    """Sorted k-minimum-values over u64 keys with an exclusive integer
    theta bound."""

    def __init__(
        self,
        params: ThetaParams | None = None,
        values: np.ndarray | None = None,
        theta: int = EXACT,
    ):
        # no mutable default instance: a shared default ThetaParams would
        # be silently shared by every sketch (round-4 ADVICE)
        self.params = params or ThetaParams()
        self.values = (
            values if values is not None else np.empty(0, dtype=np.uint64)
        )
        self.theta = int(theta)

    @staticmethod
    def _below(vals: np.ndarray, theta: int) -> np.ndarray:
        if theta >= EXACT:
            return vals
        return vals[vals < np.uint64(theta)]

    def _trim(self, vals: np.ndarray, theta: int):
        vals = self._below(vals, theta)
        if len(vals) > self.params.k:
            theta = int(vals[self.params.k])  # (k+1)-th smallest, exclusive
            vals = vals[: self.params.k]
        return vals, theta

    def add(self, keys: np.ndarray) -> None:
        h = murmur64(to_u64(np.asarray(keys)))
        merged = np.unique(np.concatenate([self.values, h]))
        self.values, self.theta = self._trim(merged, self.theta)

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        assert self.params == other.params
        theta = min(self.theta, other.theta)
        merged = np.unique(np.concatenate([self.values, other.values]))
        out = ThetaSketch(self.params)
        out.values, out.theta = out._trim(merged, theta)
        return out

    # -- estimates ----------------------------------------------------------

    def _scaled(self, count: int, theta: int) -> float:
        if theta >= EXACT:
            return float(count)
        return count / (theta / float(EXACT))

    def estimate(self) -> float:
        return self._scaled(len(self.values), self.theta)

    def intersect_estimate(self, other: "ThetaSketch") -> float:
        theta = min(self.theta, other.theta)
        av = self._below(self.values, theta)
        bv = self._below(other.values, theta)
        common = np.intersect1d(av, bv, assume_unique=True)
        return self._scaled(len(common), theta)

    def difference_estimate(self, other: "ThetaSketch") -> float:
        theta = min(self.theta, other.theta)
        av = self._below(self.values, theta)
        bv = self._below(other.values, theta)
        only = np.setdiff1d(av, bv, assume_unique=True)
        return self._scaled(len(only), theta)

    def jaccard_estimate(self, other: "ThetaSketch") -> float:
        theta = min(self.theta, other.theta)
        av = self._below(self.values, theta)
        bv = self._below(other.values, theta)
        union = len(np.union1d(av, bv))
        if union == 0:
            return 0.0
        return len(np.intersect1d(av, bv, assume_unique=True)) / union

    @property
    def relative_std_error(self) -> float:
        return 1.0 / math.sqrt(max(self.params.k - 1, 1))

    # -- serialization (theta as u64; 0 is the EXACT-mode sentinel, since a
    # legitimate exclusive bound can never be 0) -----------------------------

    def to_bytes(self) -> bytes:
        t = 0 if self.theta >= EXACT else self.theta
        head = struct.pack("<QI", t, len(self.values))
        return head + self.values.tobytes()

    @classmethod
    def from_bytes(cls, params: ThetaParams, data: bytes) -> "ThetaSketch":
        t, n = struct.unpack_from("<QI", data, 0)
        off = struct.calcsize("<QI")
        vals = np.frombuffer(data, dtype=np.uint64, count=n, offset=off).copy()
        return cls(params, vals, EXACT if t == 0 else t)


def build_theta(keys_df, key_name: str = "key", params: ThetaParams | None = None):
    """Distributed mergeable theta sketch (partial per partition → tree
    merge; shares sparkfuse.sketches._tree_build)."""
    from sparkfuse.sketches import _tree_build

    params = params or ThetaParams()
    return _tree_build(
        keys_df,
        key_name,
        make=lambda: ThetaSketch(params),
        add=lambda s, k: s.add(k),
        merge=lambda a, b: a.merge(b),
        to_bytes=lambda s: s.to_bytes(),
        from_bytes=lambda b: ThetaSketch.from_bytes(params, b),
    )
