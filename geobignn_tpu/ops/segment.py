"""Segment (scatter) reductions — the aggregation primitive of every graph op.

TPU-native replacement for torch_scatter's C++/CUDA segment reduce
(reference: code/net_util.py:132-134, code/network.py:350,
code/data_util.py:521).  Built on `jax.ops.segment_*` with a static
`num_segments` so everything stays jit-compilable.

Padding convention used throughout the framework: every array of nodes/edges
is padded to a static size; padded edges carry `row == col == trash`, where
`trash` is a reserved final node slot whose features are zero.  Under that
convention no masks are needed — padded contributions land in the trash row
and padded gathers read zeros.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int, *, sorted: bool = False):
    """`sorted=True` asserts segment_ids is non-decreasing — true for every
    edge list this framework builds (host builders lex-sort by row and the
    trash padding index is the maximum slot, structs.py) — and lets XLA use
    its sorted-scatter lowering (measured ~1.8x on the FeaStConv aggregate
    on v5e; passing it on unsorted ids silently corrupts results)."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=sorted
    )


def segment_mean(data, segment_ids, num_segments: int, *, sorted: bool = False):
    s = segment_sum(data, segment_ids, num_segments, sorted=sorted)
    ones = jnp.ones(segment_ids.shape[:1], dtype=data.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments, sorted=sorted)
    cnt = jnp.maximum(cnt, 1.0)
    return s / cnt.reshape((num_segments,) + (1,) * (s.ndim - 1))


def segment_max(data, segment_ids, num_segments: int, fill_value=0.0):
    """Segment max; empty segments get `fill_value` (torch_scatter uses 0)."""
    m = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isneginf(m), jnp.asarray(fill_value, m.dtype), m)


def segment_count(segment_ids, num_segments: int, dtype=jnp.float32, *, sorted: bool = False):
    ones = jnp.ones(segment_ids.shape[:1], dtype=dtype)
    return segment_sum(ones, segment_ids, num_segments, sorted=sorted)
