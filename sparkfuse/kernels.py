"""Pure-numpy construction & probe kernels (SURVEY.md §2.2-2.3, C1-C12/P1-P3).

Two construction strategies:

* ``build_fuse`` / ``build_xor`` — **vectorized frontier peeling**: each round
  finds every currently-singleton slot at once (``np.nonzero(count == 1)``),
  stacks those keys, and removes them from their other slots with
  ``np.add.at`` / ``np.bitwise_xor.at``. Peeling rounds are O(log n) w.h.p.,
  so the kernel is numpy-bound, not Python-loop-bound. Deterministic: the
  seed schedule is a fixed splitmix64 counter and every numpy op is
  order-stable, so independent builds of the same keys are identical
  (mirrors /root/reference/binaryfusefilter_test.go:355-394).

* ``build_fuse_reference_order`` — a sequential small-input build that follows
  the reference's exact in-memory order (counting-sort insertion, packed
  t2count accumulation, LIFO singleton queue, reverse-stack assignment,
  /root/reference/binaryfusefilter.go:96-340) so that serialized bytes
  reproduce the reference's golden stream
  (/root/reference/serialization_test.go:54). Used for format-parity tests
  only; the vectorized kernel is the production path.

Both tolerate duplicate keys (dedup upfront via np.unique — the distributed
layer additionally runs dropDuplicates before keys reach a kernel) and both
retry on peel failure with a deterministic reseed schedule bounded by
MAX_ITERATIONS (/root/reference/xorfilter.go:102-104).

These kernels run *per shard* inside ``groupBy('shard').applyInPandas``; the
distributed parallelism is across shard filters (SURVEY.md §3.1), matching
the reference's advice to build many filters side by side rather than one
giant one.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from sparkfuse.hashing import (
    MASK64,
    fingerprint64,
    mixsplit,
    mulhi64_u32,
    murmur64_scalar,
    reduce32,
    rotl64,
    seed_sequence,
)
from sparkfuse.params import (
    MAX_ITERATIONS,
    FuseParams,
    XorParams,
    fuse_parameters,
    xor_parameters,
)

_DTYPES = {8: np.uint8, 16: np.uint16, 32: np.uint32}


def _dtype_for_width(width: int, allowed=(8, 16, 32)):
    if width not in allowed:
        raise ValueError(f"fingerprint width must be one of {allowed}, got {width}")
    return _DTYPES[width]


@dataclass
class FuseFilter:
    """Immutable binary fuse filter (3-wise or 4-wise), width 8/16/32 bits.

    Field roles mirror /root/reference/binaryfusefilter.go:14-22."""

    width: int
    arity: int
    seed: int
    segment_length: int
    segment_length_mask: int
    segment_count: int
    segment_count_length: int
    fingerprints: np.ndarray  # dtype uint{width}

    @property
    def size_in_bytes(self) -> int:
        return int(self.fingerprints.nbytes)

    def bits_per_entry(self, n: int) -> float:
        return self.fingerprints.nbytes * 8 / max(n, 1)

    def contains(self, keys) -> np.ndarray:
        return fuse_contains(self, np.asarray(keys, dtype=np.uint64))


@dataclass
class XorFilter:
    """Immutable xor filter, width 8 or 16 bits ("xor8"/"xor16").

    The reference ships only Xor8 (/root/reference/xorfilter_definitions.go:4-8);
    the 16-bit variant is the same math with 16-bit fingerprint truncation
    (SURVEY.md §2.4 note)."""

    width: int
    seed: int
    block_length: int
    fingerprints: np.ndarray

    @property
    def size_in_bytes(self) -> int:
        return int(self.fingerprints.nbytes)

    def bits_per_entry(self, n: int) -> float:
        return self.fingerprints.nbytes * 8 / max(n, 1)

    def contains(self, keys) -> np.ndarray:
        return xor_contains(self, np.asarray(keys, dtype=np.uint64))


# ---------------------------------------------------------------------------
# slot derivation
# ---------------------------------------------------------------------------

def _fuse_slots(hashes: np.ndarray, p: FuseParams) -> np.ndarray:
    """(arity, n) absolute slot indices.

    Arity 3 mirrors getHashFromHash (/root/reference/binaryfusefilter.go:370-378):
    h0 = mulhi(hash, SegmentCountLength); h1/h2 = next segments xor'd with
    18-bit hash slices. Arity 4 is our extension (formulas exist in the
    reference at binaryfusefilter.go:398,407-408 but no build path): same
    scheme with slices at shifts 36/18/0.
    """
    mask = np.uint32(p.segment_length_mask)
    h0 = mulhi64_u32(hashes, p.segment_count_length)
    out = np.empty((p.arity, len(hashes)), dtype=np.uint32)
    out[0] = h0
    if p.arity == 3:
        shifts = (18, 0)
    else:
        shifts = (36, 18, 0)
    seg = np.uint32(p.segment_length)
    for lane, sh in enumerate(shifts, start=1):
        sl = (hashes >> np.uint64(sh)).astype(np.uint32) & mask
        out[lane] = h0 + np.uint32(lane) * seg
        out[lane] ^= sl
    return out


def _xor_slots(hashes: np.ndarray, p: XorParams) -> np.ndarray:
    """(3, n) absolute slot indices for the xor layout
    (/root/reference/xorfilter.go:45-84): 3 equal blocks, lanes from
    rotations 0/21/42, Lemire fast-range into each block."""
    b = p.block_length
    out = np.empty((3, len(hashes)), dtype=np.uint32)
    out[0] = reduce32(hashes.astype(np.uint32), b)
    out[1] = reduce32(rotl64(hashes, 21).astype(np.uint32), b) + np.uint32(b)
    out[2] = reduce32(rotl64(hashes, 42).astype(np.uint32), b) + np.uint32(2 * b)
    return out


# ---------------------------------------------------------------------------
# vectorized frontier peeling (shared by fuse and xor builds)
# ---------------------------------------------------------------------------

class BuildWorkspace:
    """Reusable grow-only scratch buffers — the numpy analog of the Go
    builder's cross-build buffer reuse (C5/C11: NewBinaryFuse8Builder /
    reuseBuffer, /root/reference/binaryfusefilter.go:45-79, zero-alloc test
    binaryfusefilter_test.go:398-422).

    A buffer is reallocated only when a request outgrows it, so retry
    attempts within one build AND successive shard builds inside the same
    Spark python worker process (applyInPandas feeds a task's groups through
    one process sequentially) run allocation-free after warm-up — this is
    where many-tiny-shard forests spend their per-attempt fixed costs.

    Not thread-safe by design: a PySpark worker process executes one task at
    a time; driver-side concurrent builders should pass their own instance.
    """

    def __init__(self):
        self._bufs: dict[str, np.ndarray] = {}

    def get(self, name: str, size: int, dtype) -> np.ndarray:
        """An uninitialized view of ``size`` elements (grow-only backing)."""
        arr = self._bufs.get(name)
        if arr is None or arr.size < size or arr.dtype != np.dtype(dtype):
            arr = np.empty(max(size, 1), dtype=dtype)
            self._bufs[name] = arr
        return arr[:size]

    def zeros(self, name: str, size: int, dtype) -> np.ndarray:
        arr = self.get(name, size, dtype)
        arr.fill(0)
        return arr

    def arange(self, name: str, size: int, dtype) -> np.ndarray:
        """A read-only-by-convention 0..size-1 ramp; refilled only on growth
        (callers must never write to it)."""
        arr = self._bufs.get(name)
        if arr is None or arr.size < size or arr.dtype != np.dtype(dtype):
            arr = np.arange(max(size, 1), dtype=dtype)
            self._bufs[name] = arr
        return arr[:size]

    def nbytes(self) -> int:
        return sum(a.nbytes for a in self._bufs.values())


# process-global workspace: reused across every build in this worker
_DEFAULT_WS = BuildWorkspace()


def _peel_and_assign(
    hashes: np.ndarray, slots_fn, capacity: int, dtype, ws: BuildWorkspace
):
    """One construction attempt. Returns fingerprint array or None on failure.

    Frontier peeling: every slot holding exactly one remaining key is peeled
    in the same vectorized round. Within a round the peeled slots are
    pairwise-independent (a singleton slot contains exactly one key, and that
    key's other slots hold >= that key, so no other round-member can alias
    it), which also makes the reverse per-round fingerprint assignment
    conflict-free.

    All scratch (counts, index-xor accumulator, stacks, dedup position map,
    index ramps) lives in ``ws``; only the returned fingerprint array is
    freshly allocated (it is owned by the filter).
    """
    n = len(hashes)
    if n == 0:
        return np.zeros(capacity, dtype=dtype)
    slots = slots_fn(hashes)  # (arity, n)
    arity = slots.shape[0]
    # one-pass histogram beats ufunc.at scatter for the counts; a single
    # fused xor.at call beats one per lane (ufunc.at has ~0.1ms fixed cost,
    # and the peel makes ~n/2k rounds of small calls — see PLANS.md)
    flat = slots.reshape(-1)
    count = ws.get("count", capacity, np.int32)
    np.copyto(count, np.bincount(flat, minlength=capacity), casting="unsafe")
    # XOR of key INDICES (not hashes): a singleton slot then yields the key's
    # index directly, so per-round slot triples come from a GATHER of the
    # precomputed table instead of recomputing the hash mixes, and the xor
    # accumulator is uint32 (half the .at memory traffic of uint64).
    # (n < 2^32 always: a shard is ~2M keys.)
    ixor = ws.zeros("ixor", capacity, np.uint32)
    # the value operand broadcasts against the (arity, n) index shape —
    # measured equal to an explicit tiled buffer, with no fill pass
    np.bitwise_xor.at(ixor, slots, ws.arange("ramp32", n, np.uint32))

    stack_idx = ws.get("stack_idx", n, np.int64)
    stack_slot = ws.get("stack_slot", n, np.int64)
    frontiers: list[tuple[int, int, np.ndarray]] = []  # (start, end, slot cache)
    stacked = 0

    # Peel rounds number O(hundreds) with a long small-frontier tail, so the
    # candidate set is tracked incrementally: after a round's removals, only
    # slots touched by those removals can have become singletons — a full
    # count==1 rescan per round would cost rounds x capacity.
    # int32 throughout: occurrence positions and key indices are < 2^31 at
    # any shard size, and halving these buffers matters in the bus-bound
    # many-worker regime (BENCH/BASELINE.md)
    pos = ws.get("pos", n, np.int32)
    # cand can be as long as capacity (initial round) or arity*m (later),
    # so the occurrence-number buffer must cover the larger of the two
    occ_n = max(capacity, arity * n)
    occ_all = ws.arange("occ", occ_n, np.int32)
    cand = np.nonzero(count == 1)[0]
    while cand.size:
        ids = ixor[cand]
        # A key alone in two slots at once appears twice (and a slot may
        # appear twice in cand — see below); keep ONE occurrence per key.
        # Sort-free dedup: scatter each occurrence's position keyed by id —
        # the last write wins — then keep exactly the winning occurrences.
        # (Either of a key's singleton slots is a valid assignment target:
        # the reverse pass xors over all arity lanes regardless.)
        occ = occ_all[: len(ids)]
        pos[ids] = occ
        winner = pos[ids] == occ
        uids = ids[winner]  # uint32 key indices
        sl = cand[winner]
        m = len(uids)
        stack_idx[stacked:stacked + m] = uids
        stack_slot[stacked:stacked + m] = sl
        stacked += m
        g = slots[:, uids]  # gather beats recomputing the hash mixes
        frontiers.append((stacked - m, stacked, g))
        touched = g.reshape(-1)
        # np.int32 scalar addend keeps ufunc.at on the fast same-dtype inner
        # loop; a Python int forces a buffered casting path ~12x slower
        # (measured 431us vs 35us per ~1.8k-key round, numpy 1.26)
        np.add.at(count, touched, np.int32(-1))
        np.bitwise_xor.at(ixor, g, uids)  # value broadcasts over lanes
        # duplicates (two keys of this round sharing a slot) are tolerated
        # here — next round's unique-on-ids collapses them — saving a sort
        cand = touched[count[touched] == 1]

    if stacked != n:
        return None

    fp = np.zeros(capacity, dtype=dtype)
    for start, end, g in reversed(frontiers):
        h = hashes[stack_idx[start:end]]
        acc = fingerprint64(h).astype(dtype)
        for lane in range(arity):
            acc = acc ^ fp[g[lane]]
        fp[stack_slot[start:end]] = acc
    return fp


# ---------------------------------------------------------------------------
# public builds
# ---------------------------------------------------------------------------

def build_fuse(
    keys, width: int = 8, arity: int = 3, workspace: BuildWorkspace | None = None
) -> tuple[FuseFilter, int]:
    """Build a binary fuse filter over u64 keys (vectorized).

    Semantics mirrored from buildBinaryFuse
    (/root/reference/binaryfusefilter.go:91-340): deterministic splitmix64
    seed schedule from counter 1; segment-length halving/restore heuristic on
    retries for 4 < size < 1e6; duplicate tolerance; empty set succeeds
    (/root/reference/binaryfusefilter_test.go:113-119); MAX_ITERATIONS bound.

    Returns ``(filter, iterations)`` — the iteration count feeds the
    per-shard lineage column (C12). Scratch comes from ``workspace``
    (default: the process-global one, reused across builds — C5).
    """
    ws = workspace if workspace is not None else _DEFAULT_WS
    dtype = _dtype_for_width(width)
    ukeys = np.unique(np.asarray(keys, dtype=np.uint64))
    size = len(ukeys)
    base = fuse_parameters(size, arity)
    params = base
    seeds = seed_sequence(1)
    iterations = 0
    while True:
        iterations += 1
        if iterations > MAX_ITERATIONS:
            raise RuntimeError("too many iterations")
        if 4 < size < 1_000_000:
            # escape pathological segment sizes every 4 iterations
            # (/root/reference/binaryfusefilter.go:122-141)
            if iterations % 4 == 2:
                params = params.with_segment_length(params.segment_length // 2)
            elif iterations % 4 == 3:
                params = params.with_segment_length(params.segment_length * 2)
        seed = next(seeds)
        hashes = np.unique(mixsplit(ukeys, seed))
        fp = _peel_and_assign(
            hashes,
            lambda h, p=params: _fuse_slots(h, p),
            params.array_length,
            dtype,
            ws,
        )
        if fp is not None:
            return FuseFilter(
                width=width,
                arity=arity,
                seed=seed,
                segment_length=params.segment_length,
                segment_length_mask=params.segment_length_mask,
                segment_count=params.segment_count,
                segment_count_length=params.segment_count_length,
                fingerprints=fp,
            ), iterations
    # unreachable


def build_xor(
    keys, width: int = 8, workspace: BuildWorkspace | None = None
) -> tuple[XorFilter, int]:
    """Build an xor filter (vectorized), width 8 ("xor8") or 16 ("xor16").

    Mirrors Populate (/root/reference/xorfilter.go:109-280): errors on an
    empty set (:110-113), capacity 32+ceil(1.23n) floored to x3, retries on
    a deterministic reseed schedule. Returns ``(filter, iterations)``.
    """
    ws = workspace if workspace is not None else _DEFAULT_WS
    dtype = _dtype_for_width(width, allowed=(8, 16))
    ukeys = np.unique(np.asarray(keys, dtype=np.uint64))
    size = len(ukeys)
    if size == 0:
        raise ValueError("provide a non-empty set")
    params = xor_parameters(size)
    seeds = seed_sequence(1)
    iterations = 0
    while True:
        iterations += 1
        if iterations > MAX_ITERATIONS:
            raise RuntimeError("too many iterations")
        seed = next(seeds)
        hashes = np.unique(mixsplit(ukeys, seed))
        fp = _peel_and_assign(
            hashes,
            lambda h, p=params: _xor_slots(h, p),
            params.array_length,
            dtype,
            ws,
        )
        if fp is not None:
            return XorFilter(
                width=width,
                seed=seed,
                block_length=params.block_length,
                fingerprints=fp,
            ), iterations


# ---------------------------------------------------------------------------
# probes
# ---------------------------------------------------------------------------

def fuse_contains(f: FuseFilter, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership probe (P2/P3,
    /root/reference/binaryfusefilter.go:380-387): gather 3 (or 4)
    fingerprints, xor with the key fingerprint, zero means 'probably in'."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    h = mixsplit(np.asarray(keys, dtype=np.uint64), f.seed)
    p = FuseParams(
        arity=f.arity,
        segment_length=f.segment_length,
        segment_length_mask=f.segment_length_mask,
        segment_count=f.segment_count,
        segment_count_length=f.segment_count_length,
        array_length=len(f.fingerprints),
    )
    slots = _fuse_slots(h, p)
    acc = fingerprint64(h).astype(f.fingerprints.dtype)
    for lane in range(slots.shape[0]):
        acc = acc ^ f.fingerprints[slots[lane]]
    return acc == 0


def xor_contains(f: XorFilter, keys: np.ndarray) -> np.ndarray:
    """Vectorized xor probe (P1, /root/reference/xorfilter.go:45-55)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    h = mixsplit(np.asarray(keys, dtype=np.uint64), f.seed)
    p = XorParams(block_length=f.block_length, array_length=len(f.fingerprints))
    slots = _xor_slots(h, p)
    expect = fingerprint64(h).astype(f.fingerprints.dtype)
    got = (
        f.fingerprints[slots[0]]
        ^ f.fingerprints[slots[1]]
        ^ f.fingerprints[slots[2]]
    )
    return expect == got


# ---------------------------------------------------------------------------
# reference-order sequential fuse build (golden-byte parity; small inputs)
# ---------------------------------------------------------------------------

def _get_hash_from_hash(hash_: int, seg_len: int, mask: int, scl: int):
    """Scalar 3-wise slot derivation, reference order
    (/root/reference/binaryfusefilter.go:370-378)."""
    h0 = ((hash_ * scl) >> 64) & 0xFFFFFFFF
    h1 = h0 + seg_len
    h2 = h1 + seg_len
    h1 ^= (hash_ >> 18) & mask
    h2 ^= hash_ & mask
    return h0, h1, h2


def build_fuse_reference_order(keys, width: int = 8):
    """Sequential 3-wise fuse build following the reference's exact order so
    the fingerprint *content* (not just format) matches the Go implementation
    — validated against the golden byte stream at
    /root/reference/serialization_test.go:54. Small inputs only (pure
    Python); the vectorized ``build_fuse`` is the production path.
    """
    dtype = _dtype_for_width(width)
    keys = [int(k) & MASK64 for k in keys]
    size = len(keys)
    base = fuse_parameters(size, 3)
    seg_len = base.segment_length
    seg_mask = base.segment_length_mask
    seg_count = base.segment_count
    scl = base.segment_count_length
    capacity = base.array_length

    seeds = seed_sequence(1)
    seed = next(seeds)

    t2count = [0] * capacity
    t2hash = [0] * capacity
    reverse_order = [0] * (size + 1)
    reverse_order[size] = 1
    reverse_h = [0] * size
    alone = [0] * capacity
    iterations = 0

    while True:
        iterations += 1
        if iterations > MAX_ITERATIONS:
            raise RuntimeError("too many iterations")
        if 4 < size < 1_000_000:
            if iterations % 4 == 2:
                seg_len //= 2
                seg_mask = seg_len - 1
                seg_count = seg_count * 2 + 2
                scl = seg_count * seg_len
            elif iterations % 4 == 3:
                seg_len *= 2
                seg_mask = seg_len - 1
                seg_count = seg_count // 2 - 1
                scl = seg_count * seg_len

        block_bits = 1
        while (1 << block_bits) < seg_count:
            block_bits += 1
        start_pos = [(i * size) >> block_bits for i in range(1 << block_bits)]
        bb_mask = (1 << block_bits) - 1
        for key in keys:
            hash_ = murmur64_scalar((key + seed) & MASK64)
            seg_idx = hash_ >> (64 - block_bits)
            while reverse_order[start_pos[seg_idx]] != 0:
                seg_idx = (seg_idx + 1) & bb_mask
            reverse_order[start_pos[seg_idx]] = hash_
            start_pos[seg_idx] += 1

        error = 0
        duplicates = 0
        for i in range(size):
            hash_ = reverse_order[i]
            i1, i2, i3 = _get_hash_from_hash(hash_, seg_len, seg_mask, scl)
            t2count[i1] = (t2count[i1] + 4) & 0xFF
            t2hash[i1] ^= hash_
            t2count[i2] = ((t2count[i2] + 4) ^ 1) & 0xFF
            t2hash[i2] ^= hash_
            t2count[i3] = ((t2count[i3] + 4) ^ 2) & 0xFF
            t2hash[i3] ^= hash_
            if t2hash[i1] & t2hash[i2] & t2hash[i3] == 0:
                if (
                    (t2hash[i1] == 0 and t2count[i1] == 8)
                    or (t2hash[i2] == 0 and t2count[i2] == 8)
                    or (t2hash[i3] == 0 and t2count[i3] == 8)
                ):
                    duplicates += 1
                    t2count[i1] = (t2count[i1] - 4) & 0xFF
                    t2hash[i1] ^= hash_
                    t2count[i2] = ((t2count[i2] - 4) ^ 1) & 0xFF
                    t2hash[i2] ^= hash_
                    t2count[i3] = ((t2count[i3] - 4) ^ 2) & 0xFF
                    t2hash[i3] ^= hash_
            if t2count[i1] < 4 or t2count[i2] < 4 or t2count[i3] < 4:
                error = 1

        if error == 1:
            for i in range(size):
                reverse_order[i] = 0
            for i in range(capacity):
                t2count[i] = 0
                t2hash[i] = 0
            seed = next(seeds)
            continue

        qsize = 0
        for i in range(capacity):
            alone[qsize] = i
            if (t2count[i] >> 2) == 1:
                qsize += 1
        stacksize = 0
        while qsize > 0:
            qsize -= 1
            index = alone[qsize]
            if (t2count[index] >> 2) == 1:
                hash_ = t2hash[index]
                found = t2count[index] & 3
                reverse_h[stacksize] = found
                reverse_order[stacksize] = hash_
                stacksize += 1
                i1, i2, i3 = _get_hash_from_hash(hash_, seg_len, seg_mask, scl)
                h012 = (i1, i2, i3, i1, i2)
                other1 = h012[(found + 1) % 3]
                other2 = h012[(found + 2) % 3]
                f1 = (found + 1) % 3
                f2 = (found + 2) % 3

                alone[qsize] = other1
                if (t2count[other1] >> 2) == 2:
                    qsize += 1
                t2count[other1] = ((t2count[other1] - 4) ^ f1) & 0xFF
                t2hash[other1] ^= hash_

                alone[qsize] = other2
                if (t2count[other2] >> 2) == 2:
                    qsize += 1
                t2count[other2] = ((t2count[other2] - 4) ^ f2) & 0xFF
                t2hash[other2] ^= hash_

        if stacksize + duplicates == size:
            size = stacksize
            break
        if duplicates > 0:
            # Mirror the Go retry exactly (binaryfusefilter.go:300-310): prune
            # the key list but keep the STALE ``size``. The next counting pass
            # places only len(keys) hashes, leaving hash-0 phantom slots in
            # reverse_order that participate in counting/peeling just as they
            # do in Go — required for byte parity on inputs whose duplicates
            # survive into a retry.
            keys = sorted(set(keys))
        for i in range(size):
            reverse_order[i] = 0
        for i in range(capacity):
            t2count[i] = 0
            t2hash[i] = 0
        seed = next(seeds)

    fp_mask = (1 << width) - 1
    fingerprints = [0] * capacity
    for i in range(size - 1, -1, -1):
        hash_ = reverse_order[i]
        xor2 = (hash_ ^ (hash_ >> 32)) & fp_mask
        i1, i2, i3 = _get_hash_from_hash(hash_, seg_len, seg_mask, scl)
        found = reverse_h[i]
        h012 = (i1, i2, i3, i1, i2)
        fingerprints[h012[found]] = (
            xor2 ^ fingerprints[h012[found + 1]] ^ fingerprints[h012[found + 2]]
        )

    return FuseFilter(
        width=width,
        arity=3,
        seed=seed,
        segment_length=seg_len,
        segment_length_mask=seg_mask,
        segment_count=seg_count,
        segment_count_length=scl,
        fingerprints=np.array(fingerprints, dtype=dtype),
    ), iterations
