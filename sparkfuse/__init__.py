"""sparkfuse — a from-scratch PySpark-native approximate-membership-filter library.

Re-expresses the capabilities of FastFilter/xorfilter (xor8/xor16-class and
binary-fuse filters, plus a Bloom baseline) as mergeable distributed
aggregations over Spark DataFrames: vectorized numpy kernels driven through
``groupBy(...).applyInPandas`` for construction, broadcast + vectorized gather
for probes, and exact-confirm semi-joins for precise membership queries.

Reference behavior is cited per-function as ``/root/reference/<file>:<lines>``.
No code is ported from the reference; the kernels re-derive the published
algorithms (Graf & Lemire, JEA 2020/2022) in numpy.
"""

from sparkfuse.kernels import (
    FuseFilter,
    XorFilter,
    build_fuse,
    build_xor,
    fuse_contains,
    xor_contains,
)
from sparkfuse.params import fuse_parameters, xor_parameters
from sparkfuse.serialize import (
    load_fuse_bytes,
    save_fuse_bytes,
    load_xor_bytes,
    save_xor_bytes,
)

__all__ = [
    "FuseFilter",
    "XorFilter",
    "build_fuse",
    "build_xor",
    "fuse_contains",
    "xor_contains",
    "fuse_parameters",
    "xor_parameters",
    "load_fuse_bytes",
    "save_fuse_bytes",
    "load_xor_bytes",
    "save_xor_bytes",
]
