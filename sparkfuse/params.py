"""Filter layout parameterization (SURVEY.md §2.2 C6-C8).

Pure functions computing the construction layout for xor and binary-fuse
filters. Formula behavior mirrors the reference (cited per function); these
are the published size formulas from Graf & Lemire (JEA 2020/2022).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

MAX_ITERATIONS = 1024  # retry budget; /root/reference/xorfilter.go:102-104


@dataclass(frozen=True)
class FuseParams:
    """Layout of a binary fuse filter (3-wise or 4-wise)."""

    arity: int
    segment_length: int
    segment_length_mask: int
    segment_count: int
    segment_count_length: int
    array_length: int  # number of fingerprint slots

    def with_segment_length(self, segment_length: int) -> "FuseParams":
        """Re-derive dependent fields for the retry halving heuristic
        (/root/reference/binaryfusefilter.go:122-141) keeping array_length."""
        total_segments = self.array_length // segment_length
        segment_count = total_segments - (self.arity - 1)
        return FuseParams(
            arity=self.arity,
            segment_length=segment_length,
            segment_length_mask=segment_length - 1,
            segment_count=segment_count,
            segment_count_length=segment_count * segment_length,
            array_length=self.array_length,
        )


@dataclass(frozen=True)
class XorParams:
    """Layout of an xor filter: 3 equal blocks."""

    block_length: int
    array_length: int  # 3 * block_length


def calculate_segment_length(arity: int, size: int) -> int:
    """Empirical segment length (floor is load-bearing).

    /root/reference/binaryfusefilter.go:389-402 — both the 3-wise and
    4-wise constants appear there, though the Go snapshot only wires arity 3.
    """
    if size == 0:
        return 4
    if arity == 3:
        exp = int(math.floor(math.log(size) / math.log(3.33) + 2.25))
    elif arity == 4:
        # the reference's 4-wise formula (binaryfusefilter.go:398) goes
        # negative for size <= 2 (unreachable there, reachable here) —
        # clamp to the size==0 default of 4
        exp = int(math.floor(math.log(size) / math.log(2.91) - 0.5))
    else:
        return 65536
    return 1 << max(exp, 2)


def calculate_size_factor(arity: int, size: int) -> float:
    """Space overhead factor. /root/reference/binaryfusefilter.go:404-412."""
    if arity == 3:
        return max(1.125, 0.875 + 0.25 * math.log(1000000) / math.log(size))
    if arity == 4:
        return max(1.075, 0.77 + 0.305 * math.log(600000) / math.log(size))
    return 2.0


def fuse_parameters(size: int, arity: int = 3) -> FuseParams:
    """Compute fuse layout for `size` keys.

    Mirrors initializeParameters (/root/reference/binaryfusefilter.go:342-368):
    segment length capped at 262144; capacity = round(size * sizeFactor) for
    size > 1 else 0; total segments >= arity; segment count = total-(arity-1).
    Golden-tested against the reference's parameter table
    (/root/reference/binaryfusefilter_test.go:479-495).
    """
    if arity not in (3, 4):
        raise ValueError("arity must be 3 or 4")
    segment_length = min(calculate_segment_length(arity, size), 262144)
    capacity = 0
    if size > 1:
        capacity = int(round(size * calculate_size_factor(arity, size)))
    total_segment_count = (capacity + segment_length - 1) // segment_length
    total_segment_count = max(total_segment_count, arity)
    segment_count = total_segment_count - (arity - 1)
    return FuseParams(
        arity=arity,
        segment_length=segment_length,
        segment_length_mask=segment_length - 1,
        segment_count=segment_count,
        segment_count_length=segment_count * segment_length,
        array_length=total_segment_count * segment_length,
    )


def xor_parameters(size: int) -> XorParams:
    """capacity = 32 + ceil(1.23 n), rounded down to a multiple of 3.

    /root/reference/xorfilter.go:114-120. Empty sets are an error there
    (:110-113); callers enforce that, this function just computes layout.
    """
    capacity = 32 + int(math.ceil(1.23 * size))
    capacity = capacity // 3 * 3
    return XorParams(block_length=capacity // 3, array_length=capacity)


def fuse_scratch_bytes_per_key(arity: int = 3) -> float:
    """Approximate build scratch per key (shard sizing; SURVEY.md §4).

    ~1.125 slots/key × (1B count + 8B xor-hash) + 8B reverse-order ≈ 18 B/key,
    matching the README's construction-memory warning
    (/root/reference/README.md:52).
    """
    return 1.125 * 9 + 8
