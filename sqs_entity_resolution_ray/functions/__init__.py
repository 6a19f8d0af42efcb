"""Pure, deterministic, vectorized kernels.

Everything in this package is side-effect-free and Ray-agnostic so it can
be unit-tested without a cluster and reused inside ``map_batches`` bodies.
"""
