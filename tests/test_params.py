"""Parameterization goldens (SURVEY.md §5).

The segment-length/segment-count table is the reference's own golden
(/root/reference/binaryfusefilter_test.go:479-495); each row is checked at
its boundary sizes.
"""

import math

import pytest

from sparkfuse.params import fuse_parameters, xor_parameters

# (seg_len, start_size, start_seg_cnt, end_size, end_seg_cnt)
GOLDEN_TABLE = [
    (4, 1, 1, 2, 1),
    (8, 3, 1, 8, 1),
    (16, 9, 1, 27, 2),
    (32, 28, 1, 91, 3),
    (64, 92, 1, 303, 5),
    (128, 304, 2, 1009, 9),
    (256, 1010, 4, 3361, 16),
    (512, 3362, 7, 11192, 26),
    (1024, 11193, 12, 37272, 42),
    (2048, 37273, 20, 124117, 69),
    (4096, 124118, 34, 413309, 114),
    (8192, 413310, 56, 1376321, 188),
    (16384, 1376322, 93, 4583149, 313),
]


@pytest.mark.parametrize("seg_len,s0,c0,s1,c1", GOLDEN_TABLE)
def test_fuse_param_golden_table(seg_len, s0, c0, s1, c1):
    p0 = fuse_parameters(s0)
    assert (p0.segment_length, p0.segment_count) == (seg_len, c0)
    p1 = fuse_parameters(s1)
    assert (p1.segment_length, p1.segment_count) == (seg_len, c1)


def test_fuse_param_invariants():
    for size in [0, 1, 2, 10, 1000, 123457, 5_000_000]:
        p = fuse_parameters(size)
        assert p.segment_length_mask == p.segment_length - 1
        assert p.segment_count_length == p.segment_count * p.segment_length
        assert p.array_length == (p.segment_count + 2) * p.segment_length
        assert p.segment_length <= 262144


def test_fuse_param_arity4():
    p = fuse_parameters(100_000, arity=4)
    assert p.arity == 4
    assert p.array_length == (p.segment_count + 3) * p.segment_length
    # 4-wise size factor is smaller (denser): /root/reference/binaryfusefilter.go:407-408
    p3 = fuse_parameters(100_000, arity=3)
    assert p.array_length < p3.array_length


def test_xor_params():
    # capacity = 32 + ceil(1.23 n) floored to multiple of 3
    # (/root/reference/xorfilter.go:114-115)
    for n in [1, 100, 1000, 1_000_000]:
        p = xor_parameters(n)
        expect = (32 + math.ceil(1.23 * n)) // 3 * 3
        assert p.array_length == expect
        assert p.block_length * 3 == p.array_length
