"""Pallas TPU kernel: brute-force nearest-neighbour distance.

Replaces the reference's numba-parallel O(N*M) kernel
(code/my_hausdorff.py:17-49), which backs the Hausdorff-style vertex-
distance metric (code/data_util.py:595-611).

Design: grid over tiles of the query set A; for each A-tile the kernel
loops over B-tiles resident in VMEM, computes the squared-distance block
    d = |a|^2 - 2 a.b^T + |b|^2
with the MXU (pl.dot) and folds the row-min into a VMEM accumulator — the
(TA, M) distance matrix never exists in HBM (the XLA fallback in
models/losses.py materializes a (block, M) strip per map step).  Both point
sets are zero-padded to tile multiples; padded B rows are masked with +inf
before the fold, padded A rows are dropped on the host.

f32 throughout (distances need the precision); compute is 2*N*M*K FLOPs +
the elementwise fold, MXU-bound for large M.

Measured on v5e (40k x 40k points): this kernel sustains ~117 TFLOP/s f32
(at peak) but must pad the 3-dim coordinates to the 128-lane tile — 42x
extra contraction work — so the XLA fallback (models/losses._nearest_sq,
0.67 ms) beats it (3.5 ms) for 3-D point sets and remains the default
euclidean path.  The kernel wins only for high-dimensional descriptor
matching (K >= ~64); kept as the K-agnostic building block with that
honest caveat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_A = 512
TILE_B = 1024


def _nn_kernel(a_ref, b_ref, nb_ref, out_ref, acc_ref):
    """Grid: (A_tiles, B_tiles); B is the minor (fastest) dimension."""
    j = pl.program_id(1)
    nb = nb_ref[0, 0]  # real row count of B (scalar, SMEM)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.full_like(acc_ref, jnp.inf)

    a = a_ref[:]  # (TILE_A, 3+pad)
    b = b_ref[:]  # (TILE_B, 3+pad)
    a2 = (a * a).sum(axis=1, keepdims=True)  # (TA, 1)
    b2 = (b * b).sum(axis=1)  # (TB,)
    ab = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TA, TB)
    d = a2 - 2.0 * ab + b2[None, :]

    # mask padded B rows with +inf
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + j * b.shape[0]
    d = jnp.where(col < nb, d, jnp.inf)

    acc_ref[:] = jnp.minimum(acc_ref[:], d.min(axis=1, keepdims=True))

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nearest_sq_padded(a_pad: jax.Array, b_pad: jax.Array, nb: jax.Array, interpret=False):
    n_a = a_pad.shape[0]
    grid = (n_a // TILE_A, b_pad.shape[0] // TILE_B)
    return pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_A, a_pad.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, b_pad.shape[1]), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE_A, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_a, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE_A, 1), jnp.float32)],
        interpret=interpret,
    )(a_pad, b_pad, nb)


def nearest_distance_pallas(
    a: jax.Array, b: jax.Array, interpret: bool = False
) -> jax.Array:
    """Euclidean distance from each point of a to its nearest point of b."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    n, m = a.shape[0], b.shape[0]
    # pad feature dim to the 128 lane (zeros don't change distances)
    feat = 128
    a_pad = jnp.zeros((n + (-n) % TILE_A, feat), jnp.float32).at[:n, : a.shape[1]].set(a)
    b_pad = jnp.zeros((m + (-m) % TILE_B, feat), jnp.float32).at[:m, : b.shape[1]].set(b)
    nb = jnp.full((1, 1), m, jnp.int32)
    d2 = _nearest_sq_padded(a_pad, b_pad, nb, interpret=interpret)
    return jnp.sqrt(jnp.maximum(d2[:n, 0], 0.0))
