"""Cross-framework parity: our JAX ops vs independent PyTorch references.

SURVEY.md §4 calls for an "allclose parity harness vs the PyTorch reference
per layer".  The reference's conv layers are thin uses of PyG's FeaStConv /
GCNConv / GATConv (code/network.py:258-268, :34-36, :108-124), whose
semantics are documented in each of our op modules.  Here every op is
re-implemented *independently* in plain PyTorch (index_add-based message
passing, torch autograd) from those documented equations, and we assert
forward AND gradient agreement with the JAX implementations — two
independent codebases, two AD engines, same math.

All comparisons run in float32 on CPU (tests pin JAX_PLATFORMS=cpu in
conftest.py); tolerances reflect f32 reduction-order noise.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from geobignn_tpu.ops import table as tbl
from geobignn_tpu.ops.feastconv import FeastParams, feast_conv, feast_conv_table
from geobignn_tpu.ops.gat import GATParams, gat_conv
from geobignn_tpu.ops.gcn import GCNParams, gcn_conv

RTOL, ATOL = 2e-4, 2e-5


def _random_graph(n=23, extra=40, seed=0):
    """Connected-ish undirected graph, no self-loops, both directions stored."""
    rng = np.random.default_rng(seed)
    src = np.arange(1, n)
    dst = rng.integers(0, src, size=n - 1)  # random spanning tree
    a = np.concatenate([src, rng.integers(0, n, size=extra)])
    b = np.concatenate([dst, rng.integers(0, n, size=extra)])
    keep = a != b
    a, b = a[keep], b[keep]
    und = np.unique(
        np.stack([np.concatenate([a, b]), np.concatenate([b, a])], 0), axis=1
    )
    return und.astype(np.int32)  # (2, E) row=dst, col=src


def _t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32, requires_grad=True)


# ---------------------------------------------------------------------------
# independent torch references (message passing via index_add, torch autograd)
# ---------------------------------------------------------------------------

def _feast_torch(u, c, w, b, x, edge_index):
    """q_h(i,j) = softmax_h(u_h·(x_j−x_i)+c_h); mean over N(i)∪{i} of
    sum_h q_h W_h x_j + b  — the documented FeaStConv semantics."""
    n = x.shape[0]
    row = torch.tensor(edge_index[0], dtype=torch.long)
    col = torch.tensor(edge_index[1], dtype=torch.long)
    loops = torch.arange(n)
    row = torch.cat([row, loops])
    col = torch.cat([col, loops])
    q = torch.softmax((x[col] - x[row]) @ u + c, dim=-1)  # (E+N, H)
    msg = torch.einsum("eh,ec,hco->eo", q, x[col], w)
    out = torch.zeros(n, w.shape[-1], dtype=x.dtype)
    out = out.index_add(0, row, msg)
    deg = torch.zeros(n, dtype=x.dtype).index_add(0, row, torch.ones_like(row, dtype=x.dtype))
    return out / deg[:, None] + b


def _gcn_torch(w, b, x, edge_index):
    """out = D^{-1/2}(A+I)D^{-1/2} X W + b, deg counts the self-loop."""
    n = x.shape[0]
    row = torch.tensor(edge_index[0], dtype=torch.long)
    col = torch.tensor(edge_index[1], dtype=torch.long)
    loops = torch.arange(n)
    row = torch.cat([row, loops])
    col = torch.cat([col, loops])
    deg = torch.zeros(n).index_add(0, row, torch.ones(row.shape[0]))
    dinv = deg.rsqrt()
    h = x @ w
    msg = (dinv[row] * dinv[col])[:, None] * h[col]
    return torch.zeros(n, w.shape[1]).index_add(0, row, msg) + b


def _gat_torch(w, a_l, a_r, b, x, edge_index, slope=0.2):
    """e_ij = LeakyReLU(a_l·W x_i + a_r·W x_j); alpha = softmax over
    N(i)∪{i}; out_i = concat_h sum_j alpha W x_j."""
    n = x.shape[0]
    heads, c_out = a_l.shape
    row = torch.tensor(edge_index[0], dtype=torch.long)
    col = torch.tensor(edge_index[1], dtype=torch.long)
    loops = torch.arange(n)
    row = torch.cat([row, loops])
    col = torch.cat([col, loops])
    h = torch.einsum("nc,cho->nho", x, w)
    e = torch.nn.functional.leaky_relu(
        (h * a_l).sum(-1)[row] + (h * a_r).sum(-1)[col], slope
    )  # (E+N, H)
    m = torch.full((n, heads), -torch.inf).index_reduce(
        0, row, e, "amax", include_self=False
    )
    z = torch.exp(e - m[row])
    denom = torch.zeros(n, heads).index_add(0, row, z)
    alpha = z / denom[row]
    msg = alpha[:, :, None] * h[col]
    out = torch.zeros(n, heads, c_out).index_add(0, row, msg)
    return out.reshape(n, heads * c_out) + b


# ---------------------------------------------------------------------------
# the harness
# ---------------------------------------------------------------------------

def _compare(jax_fn, jax_args, torch_out, torch_leaves):
    """Forward allclose + gradient allclose through a shared random cotangent.
    `torch_leaves[i]` must be the torch twin of positional arg i."""
    out = jax_fn(*jax_args)
    np.testing.assert_allclose(
        np.asarray(out), torch_out.detach().numpy(), rtol=RTOL, atol=ATOL
    )
    g = np.random.default_rng(7).normal(size=out.shape).astype(np.float32)
    torch_out.backward(torch.tensor(g))
    jg = jax.grad(
        lambda *a: (jax_fn(*a) * g).sum(), argnums=tuple(range(len(jax_args)))
    )(*jax_args)
    for i, t_leaf in enumerate(torch_leaves):
        np.testing.assert_allclose(
            np.asarray(jg[i]), t_leaf.grad.numpy(), rtol=RTOL, atol=ATOL,
            err_msg=f"grad mismatch at arg {i}",
        )


def test_feastconv_matches_torch():
    rng = np.random.default_rng(1)
    e = _random_graph(seed=1)
    n, c_in, c_out, heads = 23, 6, 5, 4
    x = rng.normal(size=(n, c_in)).astype(np.float32)
    u = (rng.normal(size=(c_in, heads)) * 0.3).astype(np.float32)
    c = rng.normal(size=(heads,)).astype(np.float32) * 0.2
    w = rng.normal(size=(heads, c_in, c_out)).astype(np.float32) * 0.4
    b = rng.normal(size=(c_out,)).astype(np.float32)

    tu, tc, tw, tb, tx = map(_t, (u, c, w, b, x))
    t_out = _feast_torch(tu, tc, tw, tb, tx, e)

    def jf(u_, c_, w_, b_, x_):
        return feast_conv(FeastParams(u_, c_, w_, b_), x_, jnp.asarray(e))

    _compare(
        jf, tuple(map(jnp.asarray, (u, c, w, b, x))),
        t_out, (tu, tc, tw, tb, tx),
    )


def test_feastconv_table_matches_torch():
    """The scatter-free dense-table fast path against the same torch oracle.
    Tables need the trash-slot convention, so the graph is padded by one
    zero node and the comparison drops that lane."""
    rng = np.random.default_rng(2)
    e = _random_graph(seed=2)
    n, c_in, c_out, heads = 23, 6, 5, 4
    n_pad = n + 1
    x = np.zeros((n_pad, c_in), np.float32)
    x[:n] = rng.normal(size=(n, c_in)).astype(np.float32)
    u = (rng.normal(size=(c_in, heads)) * 0.3).astype(np.float32)
    c = rng.normal(size=(heads,)).astype(np.float32) * 0.2
    w = rng.normal(size=(heads, c_in, c_out)).astype(np.float32) * 0.4
    b = rng.normal(size=(c_out,)).astype(np.float32)

    nbr, kmask, _ = tbl.neighbor_table_np(e, n_pad)
    rev, _ = tbl.reverse_table_np(nbr, n_pad)

    tu, tc, tw, tb = map(_t, (u, c, w, b))
    tx = _t(x[:n])
    t_out = _feast_torch(tu, tc, tw, tb, tx, e)

    params = FeastParams(*map(jnp.asarray, (u, c, w, b)))
    out = feast_conv_table(
        params, jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(kmask), jnp.asarray(rev)
    )
    np.testing.assert_allclose(
        np.asarray(out[:n]), t_out.detach().numpy(), rtol=RTOL, atol=ATOL
    )

    g = np.random.default_rng(8).normal(size=(n, c_out)).astype(np.float32)
    t_out.backward(torch.tensor(g))
    gpad = np.zeros((n_pad, c_out), np.float32)
    gpad[:n] = g

    def loss(x_):
        return (
            feast_conv_table(
                params, x_, jnp.asarray(nbr), jnp.asarray(kmask), jnp.asarray(rev)
            )
            * gpad
        ).sum()

    dx = jax.grad(loss)(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(dx[:n]), tx.grad.numpy(), rtol=RTOL, atol=ATOL
    )


def test_gcn_matches_torch():
    rng = np.random.default_rng(3)
    e = _random_graph(seed=3)
    n, c_in, c_out = 23, 7, 4
    x = rng.normal(size=(n, c_in)).astype(np.float32)
    w = rng.normal(size=(c_in, c_out)).astype(np.float32) * 0.4
    b = rng.normal(size=(c_out,)).astype(np.float32)

    tw, tb, tx = map(_t, (w, b, x))
    t_out = _gcn_torch(tw, tb, tx, e)

    def jf(w_, b_, x_):
        return gcn_conv(GCNParams(w_, b_), x_, jnp.asarray(e))

    _compare(
        jf, tuple(map(jnp.asarray, (w, b, x))),
        t_out, (tw, tb, tx),
    )


def test_gat_matches_torch():
    rng = np.random.default_rng(4)
    e = _random_graph(seed=4)
    n, c_in, c_out, heads = 23, 6, 5, 3
    x = rng.normal(size=(n, c_in)).astype(np.float32)
    w = rng.normal(size=(c_in, heads, c_out)).astype(np.float32) * 0.4
    a_l = rng.normal(size=(heads, c_out)).astype(np.float32) * 0.3
    a_r = rng.normal(size=(heads, c_out)).astype(np.float32) * 0.3
    b = rng.normal(size=(heads * c_out,)).astype(np.float32)

    tw, tal, tar, tb, tx = map(_t, (w, a_l, a_r, b, x))
    t_out = _gat_torch(tw, tal, tar, tb, tx, e)

    def jf(w_, al_, ar_, b_, x_):
        return gat_conv(GATParams(w_, al_, ar_, b_), x_, jnp.asarray(e))

    _compare(
        jf, tuple(map(jnp.asarray, (w, a_l, a_r, b, x))),
        t_out, (tw, tal, tar, tb, tx),
    )
