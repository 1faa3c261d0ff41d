"""Dense neighbor tables: the scatter-free aggregation layout for TPU.

Replaces COO + segment-reduce (torch_scatter semantics, reference
code/net_util.py:132-134) on every hot path.  XLA's scatter-add lowers to a
serialized per-row update loop on TPU — measured 12-23x slower than the
equivalent gathers at mesh-graph sizes — while gathers vectorize.  Mesh
graphs have tightly bounded degree (1-ring valence; max 12-16), so the COO
edge list densifies into a padded per-node neighbor table

    nbr[i, k] = k-th in-neighbor of node i   (trash slot for padding)

and, because adjacency is symmetric, the BACKWARD pass of the gather is
itself a gather through the precomputed reverse table

    rev[j, r] = r-th flattened position (i*K + k) with nbr[i, k] == j,

so forward and backward both run scatter-free (`table_gather`).  The same
primitive covers pooling (cluster-member tables, each fine node appears
exactly once -> rev has one column), unpooling (fan-in <= 2^pool_step), and
the cross-domain face->vertex gather (reference network.py:335).

Measured on v5e, f-branch conv-1 scale (N=164k, E=2.0M, H=9, C=64):
12x forward / 5.6x backward over row-sorted segment_sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from geobignn_tpu.structs import round_up


# --------------------------------------------------------------------------
# the primitive
# --------------------------------------------------------------------------

@jax.custom_vjp
def table_gather(x: jax.Array, nbr: jax.Array, rev: jax.Array) -> jax.Array:
    """out[..m, k] = x[nbr[..m, k]]; gradient w.r.t. x flows through `rev`
    (positions into the flattened leading axes of `out`; value nbr.size
    means "no reference" and contributes zero).  `rev` rows MUST enumerate
    every position of `nbr` that holds the row's index — rows not covered
    (e.g. the trash slot) silently get zero gradient."""
    return x[nbr]


def _tg_fwd(x, nbr, rev):
    return x[nbr], (nbr, rev)


def _tg_bwd(res, g):
    nbr, rev = res
    c = g.shape[-1]
    gflat = jnp.concatenate(
        [g.reshape(-1, c), jnp.zeros((1, c), g.dtype)], axis=0
    )
    dx = gflat[rev].sum(axis=1)
    return dx, None, None


table_gather.defvjp(_tg_fwd, _tg_bwd)


@jax.custom_vjp
def table_gather_compact(x, nbr, src_b, rev_c):
    """table_gather whose backward runs over a COMPACT source list.

    For boundary-style tables only a small subset of x's rows ever appears
    in `nbr`; a full (n, R) reverse table makes backward gather n*R rows
    (the 327k hybrid measured ~60 ms/conv of exactly this).  Here
    `src_b` (S,) lists the distinct sources (trash-padded) and
    `rev_c` (S, R) their positions in flattened nbr (pad = nbr.size);
    backward gathers S*R rows and scatter-adds S unique rows into dx."""
    return x[nbr]


def _tgc_fwd(x, nbr, src_b, rev_c):
    # x rides the residuals only structurally (the conv's other terms keep
    # it alive anyway); zeros_like avoids shape/dtype leaves in the pytree
    return x[nbr], (x, src_b, rev_c)


def _tgc_bwd(res, g):
    x, src_b, rev_c = res
    c = g.shape[-1]
    gflat = jnp.concatenate(
        [g.reshape(-1, c), jnp.zeros((1, c), g.dtype)], axis=0
    )
    contrib = gflat[rev_c].sum(axis=1)  # (S, C)
    dx = jnp.zeros_like(x).at[src_b].add(contrib.astype(x.dtype))
    return dx, None, None, None


table_gather_compact.defvjp(_tgc_fwd, _tgc_bwd)


# --------------------------------------------------------------------------
# host-side builders (vectorized numpy)
# --------------------------------------------------------------------------

def neighbor_table_np(
    edge_index: np.ndarray,  # (2, E) trash-padded COO (row==col==trash on pad)
    n_pad: int,
    k_pad: int | None = None,
    granularity: int = 8,
) -> tuple[np.ndarray, np.ndarray, int]:
    """COO -> (nbr (n_pad, K) int32, kmask (n_pad, K) f32, K).

    Rows need not be sorted.  Padded/self-loop edges (row == col) are
    dropped — the framework's edge lists never carry real self-loops
    (implicit-self-loop convention, ops/feastconv.py)."""
    trash = n_pad - 1
    row = edge_index[0].astype(np.int64)
    col = edge_index[1].astype(np.int64)
    real = row != col
    row, col = row[real], col[real]

    order = np.argsort(row, kind="stable")
    row_s, col_s = row[order], col[order]
    deg = np.bincount(row_s, minlength=n_pad)
    ptr = np.zeros(n_pad + 1, np.int64)
    np.cumsum(deg, out=ptr[1:])
    k = int(deg.max()) if deg.size else 0
    k_out = k_pad if k_pad is not None else round_up(max(k, 1), granularity)
    if k > k_out:
        raise ValueError(f"max degree {k} exceeds k_pad {k_out}")

    nbr = np.full((n_pad, k_out), trash, np.int32)
    pos = np.arange(row_s.size, dtype=np.int64) - ptr[row_s]
    nbr[row_s, pos] = col_s
    kmask = np.zeros((n_pad, k_out), np.float32)
    kmask[row_s, pos] = 1.0
    return nbr, kmask, k_out


def reverse_table_np(
    nbr: np.ndarray,  # (M, K) int32 source indices
    n_src: int,
    src_mask: np.ndarray | None = None,  # (n_src,) bool/f32: real source rows
    r_pad: int | None = None,
    granularity: int = 8,
) -> tuple[np.ndarray, int]:
    """Positions of each source row inside `nbr` -> rev (n_src, R) int32;
    pad value nbr.size (the zero row of the extended flattened gradient).

    `src_mask` marks REAL source rows; references to non-real rows (trash
    slots — note a disjoint-union batch has one PER COMPONENT, not just
    n_src-1) are dropped: every padding entry points at a trash slot, whose
    gradient is discarded anyway, and keeping them would blow up the padded
    fan-in R.  Default mask: everything but the final row."""
    m, kk = nbr.shape
    flat = nbr.reshape(-1).astype(np.int64)
    if src_mask is None:
        valid = flat != (n_src - 1)
    else:
        real = np.asarray(src_mask).astype(bool)
        valid = real[flat]
    positions = np.nonzero(valid)[0]
    vals = flat[positions]
    order = np.argsort(vals, kind="stable")
    vals_s, pos_s = vals[order], positions[order]
    cnt = np.bincount(vals_s, minlength=n_src)
    start = np.zeros(n_src + 1, np.int64)
    np.cumsum(cnt, out=start[1:])
    r = int(cnt.max()) if cnt.size else 0
    r_out = r_pad if r_pad is not None else round_up(max(r, 1), granularity)
    if r > r_out:
        raise ValueError(f"max fan-in {r} exceeds r_pad {r_out}")

    rev = np.full((n_src, r_out), m * kk, np.int32)
    rank = np.arange(vals_s.size, dtype=np.int64) - start[vals_s]
    rev[vals_s, rank] = pos_s
    return rev, r_out


def members_table_np(
    cluster: np.ndarray,  # (n_in,) int32 fine -> coarse (padding -> a trash)
    fine_mask: np.ndarray | None,  # (n_in,) real fine slots; None = all but last
    n_out: int,
    m_pad: int | None = None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Cluster-member table for gather-pooling: members[c, j] = j-th fine
    slot of coarse c, padded with the FINE trash slot (whose features are
    zero under the framework invariant).  Only fine slots marked real in
    `fine_mask` enter the table — padding fine slots all map onto (possibly
    per-component) coarse trash rows and would blow up m_pad."""
    n_in = cluster.shape[0]
    fine_trash = n_in - 1
    if fine_mask is None:
        real_fine = np.ones(n_in, bool)
        real_fine[-1] = False
    else:
        real_fine = np.asarray(fine_mask).astype(bool)
    fines = np.nonzero(real_fine)[0]
    cl = cluster[fines].astype(np.int64)
    order = np.argsort(cl, kind="stable")
    cl_s = cl[order]
    fines_s = fines[order]
    cnt = np.bincount(cl_s, minlength=n_out)
    start = np.zeros(n_out + 1, np.int64)
    np.cumsum(cnt, out=start[1:])
    m = int(cnt.max()) if cnt.size else 0
    m_out = m_pad if m_pad is not None else max(m, 1)
    if m > m_out:
        raise ValueError(f"max cluster size {m} exceeds m_pad {m_out}")

    members = np.full((n_out, m_out), fine_trash, np.int32)
    rank = np.arange(cl_s.size, dtype=np.int64) - start[cl_s]
    members[cl_s, rank] = fines_s
    mmask = np.zeros((n_out, m_out), np.float32)
    mmask[cl_s, rank] = 1.0
    return members, mmask, m_out


# --------------------------------------------------------------------------
# gather-formulated reductions built on the primitive
# --------------------------------------------------------------------------

def gather_pool_max(x, members, rev, mmask):
    """segment_max(x, cluster) re-expressed as max over gathered members.
    Padding members are masked to -inf (a zero-fill would clip genuinely
    negative maxima — activations are LeakyReLU outputs); empty coarse rows
    (only the trash row) fall back to 0, matching segment_max's
    fill_value=0 convention (ops/segment.py)."""
    g = table_gather(x, members, rev)  # (n_out, m, C)
    neg = jnp.asarray(-jnp.inf, g.dtype)
    m = jnp.where(mmask[..., None] > 0, g, neg).max(axis=1)
    has = mmask.sum(axis=1) > 0
    return jnp.where(has[:, None], m, 0.0)


def gather_pool_mean(x, members, rev, mmask):
    g = table_gather(x, members, rev)
    cnt = jnp.maximum(mmask.sum(axis=1), 1.0)
    return (g * mmask[..., None]).sum(axis=1) / cnt[:, None]


def gather_unpool(x, unpool, rev):
    """x[unpool] with a scatter-free backward (rev from reverse_table_np
    over unpool[:, None])."""
    return table_gather(x, unpool[:, None], rev)[:, 0]
