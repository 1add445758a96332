"""Quarantined experimental kernels -- NOT on any production path.

These exist for benchmarking and future re-evaluation only; the production
matmul paths are the merged-training operands (kernels/merged.py) with the
fused-add kernel fallback (kernels/monarch_pallas.monarch_add).  See
docs/BENCHMARKS.md for the measurements that retired each experiment.
"""
