"""Kernel correctness surface, mirroring the reference tests 1:1
(SURVEY.md §5; /root/reference/xorfilter_test.go, binaryfusefilter_test.go).
"""

import re

import numpy as np
import pytest

from sparkfuse.hashing import splitmix64_fill
from sparkfuse.kernels import (
    BuildWorkspace,
    build_fuse,
    build_fuse_reference_order,
    build_xor,
)

SMALL = 100          # /root/reference/binaryfusefilter_test.go:17-19
MID = 11_500
BIG = 1_000_000


def rand_keys(n, seed):
    return np.random.default_rng(seed).integers(
        0, 2**63, n, dtype=np.int64
    ).view(np.uint64)


# ---------------------------------------------------------------------------
# zero false negatives (the hard invariant)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("width", [8, 16, 32])
@pytest.mark.parametrize("n", [SMALL, MID])
def test_fuse_zero_false_negatives_small_mid(width, n):
    keys = splitmix64_fill(n, counter_start=42)
    f, _ = build_fuse(keys, width=width)
    assert f.contains(keys).all()


@pytest.mark.parametrize("arity", [3, 4])
def test_fuse_zero_false_negatives_big(arity):
    keys = rand_keys(BIG, 11)
    f, _ = build_fuse(keys, width=8, arity=arity)
    assert f.contains(keys).all()


@pytest.mark.parametrize("width", [8, 16])
def test_xor_zero_false_negatives(width):
    for n in (SMALL, MID):
        keys = splitmix64_fill(n, counter_start=7)
        f, _ = build_xor(keys, width=width)
        assert f.contains(keys).all()


def test_retrials():
    # 10 trials x 1000 keys (/root/reference/binaryfusefilter_test.go:50-60)
    for trial in range(10):
        keys = rand_keys(1000, 100 + trial)
        f, _ = build_fuse(keys, width=8)
        assert f.contains(keys).all()
        x, _ = build_xor(keys, width=8)
        assert x.contains(keys).all()


# ---------------------------------------------------------------------------
# false-positive rate + bits/entry (published bounds, BASELINE.md)
# ---------------------------------------------------------------------------

def _fpp(filt, keys, n_probes=10_000_000, seed=99):
    probes = rand_keys(n_probes, seed)
    mask = ~np.isin(probes, keys)
    return filt.contains(probes[mask]).mean()


def test_fuse8_fpp_and_bpe():
    keys = rand_keys(BIG, 21)
    f, _ = build_fuse(keys, width=8)
    fpp = _fpp(f, keys)
    assert fpp < 0.0050, fpp  # ~0.39% published; hard bound like xorfilter_test.go:38
    assert f.bits_per_entry(BIG) < 9.1  # ~9 bits/entry for 1e6 keys


def test_fuse16_fpp_and_bpe():
    keys = rand_keys(BIG, 22)
    f, _ = build_fuse(keys, width=16)
    fpp = _fpp(f, keys)
    assert fpp < 0.0001, fpp  # ~0.0015% published
    assert f.bits_per_entry(BIG) < 18.2


def test_fuse32_fpp():
    keys = rand_keys(MID, 23)
    f, _ = build_fuse(keys, width=32)
    assert _fpp(f, keys, n_probes=2_000_000) == 0.0  # ~2e-8% published


def test_xor8_fpp_and_bpe():
    keys = rand_keys(BIG, 24)
    f, _ = build_xor(keys, width=8)
    fpp = _fpp(f, keys)
    assert fpp < 0.0040, fpp  # hard assert mirror of xorfilter_test.go:25-38
    assert abs(f.bits_per_entry(BIG) - 9.84) < 0.02


def test_xor16_fpp():
    keys = rand_keys(BIG, 25)
    f, _ = build_xor(keys, width=16)
    assert _fpp(f, keys) < 0.0001


def test_fuse_4wise_fpp_and_bpe():
    keys = rand_keys(BIG, 26)
    f, _ = build_fuse(keys, width=8, arity=4)
    assert _fpp(f, keys) < 0.0055
    # 4-wise is denser: ~8.6 bits/entry at 1e6
    assert f.bits_per_entry(BIG) < 9.0


# ---------------------------------------------------------------------------
# duplicates / empty / edge sets (F3 fixtures)
# ---------------------------------------------------------------------------

def test_duplicate_keys_small():
    # /root/reference/xorfilter_test.go:114-120, binaryfusefilter_test.go:121-127
    for keys in ([1, 77, 31, 241, 303, 303], [303, 1, 77, 31, 241, 303]):
        f, _ = build_fuse(keys, width=8)
        assert f.contains(keys).all()
        x, _ = build_xor(keys, width=8)
        assert x.contains(keys).all()


def test_duplicate_keys_issue30_corpus():
    # Parse the 126-key duplicate-heavy literal from the reference test
    # (/root/reference/binaryfusefilter_test.go:129-257) rather than copying it.
    src = open("/root/reference/binaryfusefilter_test.go").read()
    m = re.search(
        r"func TestBinaryFuseN_DuplicateKeysBinaryFuseDup_Issue30.*?"
        r"keys := \[\]uint64\{(.*?)\}",
        src,
        re.S,
    )
    assert m, "could not locate Issue30 corpus in reference"
    keys = [int(x) for x in re.findall(r"\d+", m.group(1))]
    assert len(keys) > 100
    f, _ = build_fuse(keys, width=8)
    assert f.contains(keys).all()
    x, _ = build_xor(keys, width=8)
    assert x.contains(keys).all()


def test_empty_set_semantics():
    # fuse succeeds on [] (/root/reference/binaryfusefilter_test.go:113-119);
    # xor errors (/root/reference/xorfilter.go:110-113)
    f, _ = build_fuse([], width=16)
    # an all-zero 16-bit filter accepts a key only when its fingerprint
    # truncates to 0 (~1/65536) — effectively rejects everything
    assert f.contains(np.arange(10_000, dtype=np.uint64)).mean() < 0.001
    with pytest.raises(ValueError):
        build_xor([], width=8)


def test_single_key():
    f, _ = build_fuse([42], width=8)
    assert f.contains([42]).all()
    x, _ = build_xor([42], width=8)
    assert x.contains([42]).all()


def test_hashed_pairs_regression():
    # Issue35 analog (/root/reference/xorfilter_test.go:182-220): keys that are
    # real hashes of structured (i%10, i%100000) pairs, 2000 and 40000 keys.
    for n in (2000, 40000):
        i = np.arange(n, dtype=np.uint64)
        pairs = (i % np.uint64(10)) << np.uint64(32) | (i % np.uint64(100000))
        keys = np.unique(splitmix64_fill(1, 1)[0] ^ pairs)  # structured, collapsible
        from sparkfuse.hashing import murmur64
        keys = murmur64(pairs)
        f, _ = build_fuse(keys, width=8)
        assert f.contains(keys).all()
        x, _ = build_xor(keys, width=8)
        assert x.contains(keys).all()


# ---------------------------------------------------------------------------
# determinism (/root/reference/binaryfusefilter_test.go:355-394)
# ---------------------------------------------------------------------------

def test_build_determinism():
    rng = np.random.default_rng(5)
    for _ in range(20):
        n = int(rng.integers(1, 20_000))
        width = int(rng.choice([8, 16, 32]))
        keys = rand_keys(n, int(rng.integers(0, 2**31)))
        f1, it1 = build_fuse(keys, width=width)
        f2, it2 = build_fuse(keys, width=width)
        assert f1.seed == f2.seed and it1 == it2
        assert np.array_equal(f1.fingerprints, f2.fingerprints)


def test_xor_build_determinism():
    keys = rand_keys(5000, 77)
    f1, _ = build_xor(keys, width=8)
    f2, _ = build_xor(keys, width=8)
    assert f1.seed == f2.seed
    assert np.array_equal(f1.fingerprints, f2.fingerprints)


# ---------------------------------------------------------------------------
# boundary sizes build within iteration budget
# (/root/reference/binaryfusefilter_test.go:511-551)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("size", [1, 2, 3, 8, 9, 27, 28, 91, 92, 303, 304,
                                  1009, 1010, 3361, 3362, 11192, 11193,
                                  37272, 37273, 124117])
def test_boundary_sizes(size):
    keys = splitmix64_fill(size, counter_start=size)
    f, iterations = build_fuse(keys, width=8)
    assert iterations <= 64, (size, iterations)
    assert f.contains(keys).all()


# ---------------------------------------------------------------------------
# reference-order build agrees with vectorized build semantics
# ---------------------------------------------------------------------------

def test_reference_order_membership_parity():
    keys = splitmix64_fill(2000, counter_start=3)
    a, _ = build_fuse_reference_order(keys, width=8)
    b, _ = build_fuse(keys, width=8)
    assert a.contains(keys).all() and b.contains(keys).all()
    # identical layout parameters and seed schedule outcome
    assert (a.segment_length, a.segment_count) == (b.segment_length, b.segment_count)


# ---------------------------------------------------------------------------
# C5 workspace reuse (Go builder reuseBuffer analog,
# /root/reference/binaryfusefilter_test.go:398-422 zero-alloc test)
# ---------------------------------------------------------------------------

def _buf_addrs(ws):
    return {k: v.__array_interface__["data"][0] for k, v in ws._bufs.items()}


def test_workspace_zero_realloc_across_builds():
    ws = BuildWorkspace()
    keys = splitmix64_fill(MID, counter_start=5)
    build_fuse(keys, width=8, workspace=ws)
    build_fuse(keys, width=16, arity=4, workspace=ws)  # largest rep demand
    warm = _buf_addrs(ws)
    warm_bytes = ws.nbytes()
    # same-size and smaller builds (fuse AND xor share the workspace) must
    # not allocate new scratch
    for n in (MID, MID // 2, SMALL):
        k = splitmix64_fill(n, counter_start=n)
        build_fuse(k, width=8, workspace=ws)
        build_fuse(k, width=16, arity=4, workspace=ws)
        build_xor(k, width=8, workspace=ws)
    assert _buf_addrs(ws) == warm
    assert ws.nbytes() == warm_bytes


def test_workspace_does_not_change_output():
    keys = splitmix64_fill(MID, counter_start=9)
    fresh, it_fresh = build_fuse(keys, width=8, workspace=BuildWorkspace())
    dirty_ws = BuildWorkspace()
    # dirty the workspace with unrelated builds first
    build_fuse(splitmix64_fill(3000, counter_start=1), width=32, workspace=dirty_ws)
    build_xor(splitmix64_fill(777, counter_start=2), width=16, workspace=dirty_ws)
    reused, it_reused = build_fuse(keys, width=8, workspace=dirty_ws)
    assert it_fresh == it_reused
    assert fresh.seed == reused.seed
    assert np.array_equal(fresh.fingerprints, reused.fingerprints)
