"""Property-based tests (hypothesis) for the kernel layer — the fuzzing
layer the reference's fixed-size test grid doesn't have."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkfuse.kernels import build_fuse, build_xor
from sparkfuse.serialize import (
    load_fuse_bytes,
    load_xor_bytes,
    save_fuse_bytes,
    save_xor_bytes,
)

u64 = st.integers(min_value=0, max_value=2**64 - 1)
key_lists = st.lists(u64, min_size=0, max_size=400)
S = settings(max_examples=40, deadline=None,
             suppress_health_check=[HealthCheck.too_slow])


@given(keys=key_lists, width=st.sampled_from([8, 16, 32]),
       arity=st.sampled_from([3, 4]))
@S
def test_fuse_never_false_negative(keys, width, arity):
    f, iterations = build_fuse(keys, width=width, arity=arity)
    assert iterations <= 1024
    if keys:
        assert f.contains(np.array(keys, dtype=np.uint64)).all()


@given(keys=st.lists(u64, min_size=1, max_size=400),
       width=st.sampled_from([8, 16]))
@S
def test_xor_never_false_negative(keys, width):
    f, _ = build_xor(keys, width=width)
    assert f.contains(np.array(keys, dtype=np.uint64)).all()


@given(keys=key_lists)
@S
def test_fuse_serialization_total(keys):
    f, _ = build_fuse(keys, width=16)
    g = load_fuse_bytes(save_fuse_bytes(f), width=16)
    assert np.array_equal(g.fingerprints, f.fingerprints)
    if keys:
        assert g.contains(np.array(keys, dtype=np.uint64)).all()


@given(keys=st.lists(u64, min_size=1, max_size=300))
@S
def test_xor_serialization_total(keys):
    f, _ = build_xor(keys, width=8)
    g = load_xor_bytes(save_xor_bytes(f))
    assert g.contains(np.array(keys, dtype=np.uint64)).all()


@given(keys=key_lists)
@S
def test_fuse_determinism_property(keys):
    a, ia = build_fuse(keys, width=8)
    b, ib = build_fuse(keys, width=8)
    assert ia == ib and a.seed == b.seed
    assert np.array_equal(a.fingerprints, b.fingerprints)


@given(keys=st.lists(u64, min_size=0, max_size=300),
       extra=st.lists(u64, min_size=0, max_size=50))
@S
def test_fuse_duplicates_irrelevant(keys, extra):
    """Building over keys+duplicates equals building over the unique set."""
    dup = keys + keys[: len(keys) // 2] + extra + extra
    a, _ = build_fuse(dup, width=8)
    b, _ = build_fuse(list(set(dup)), width=8)
    assert a.seed == b.seed
    assert np.array_equal(a.fingerprints, b.fingerprints)


@given(
    samples=st.lists(
        st.integers(min_value=-(2**15), max_value=2**15 - 1), min_size=0,
        max_size=2000,
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@S
def test_wav_roundtrip_total(samples, rate):
    from sparkfuse.multimodal import decode_wav_pcm16, encode_wav_pcm16

    s = np.array(samples, dtype=np.int16)
    out, got_rate = decode_wav_pcm16(encode_wav_pcm16(s, rate))
    assert got_rate == rate
    assert (out == s).all()


@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@S
def test_ppm_roundtrip_total(h, w, seed):
    from sparkfuse.multimodal import decode_ppm, encode_ppm

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(px)) == px).all()


@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=2000),
    st.integers(2, 64),
    st.integers(1, 5),
)
@settings(max_examples=40, deadline=None)
def test_misra_gries_invariants_property(vals, capacity, n_chunks):
    """For ANY stream, chunking, and capacity: counters never overcount,
    undercount <= dec <= n/(capacity+1), at most `capacity` keys tracked,
    and every key with true count > dec is present. Also: merging an
    arbitrary split ≡ same invariants."""
    from sparkfuse.sketches import MgParams, MisraGries

    data = np.array(vals, dtype=np.int64)
    params = MgParams(capacity=capacity)
    mg = MisraGries(params)
    for chunk in np.array_split(data, min(n_chunks, len(data))):
        if len(chunk):
            mg.add(chunk)
    split = len(data) // 2
    a, b = MisraGries(params), MisraGries(params)
    if split:
        a.add(data[:split])
    if len(data) - split:
        b.add(data[split:])
    for summary in (mg, a.merge(b)):
        assert summary.n == len(data)
        assert len(summary.keys) <= capacity
        assert summary.dec <= summary.n // (capacity + 1)
        uniq, counts = np.unique(data, return_counts=True)
        est = summary.estimates(uniq.astype(np.uint64))
        assert bool((est <= counts).all())           # never overcount
        assert bool((est >= counts - summary.dec).all())  # bounded undercount
        assert bool((est[counts > summary.dec] > 0).all())  # presence
