"""Reference-style PyTorch (CPU) baseline for bench.py.

Re-implements the reference's compute semantics (FeaStConv message passing,
dual U-Net with precomputed pooling, dual L1 loss, Adam) in plain torch —
torch_geometric is not installed here, so the conv is written as the same
gather / matmul / index_add pipeline its CUDA kernels implement.  This is
the fairest runnable stand-in for the reference's per-step cost on this
machine; the result is cached in BENCH_BASELINE.json.

Run: python bench_baseline_torch.py  (prints steps/s)
"""

from __future__ import annotations

import json
import time

import numpy as np
import torch
import torch.nn.functional as F


class TorchFeaStConv(torch.nn.Module):
    def __init__(self, c_in, c_out, heads=9):
        super().__init__()
        self.u = torch.nn.Parameter(torch.randn(c_in, heads) * 0.1)
        self.c = torch.nn.Parameter(torch.zeros(heads))
        self.w = torch.nn.Parameter(torch.empty(heads, c_in, c_out))
        torch.nn.init.xavier_uniform_(self.w)
        self.b = torch.nn.Parameter(torch.zeros(c_out))

    def forward(self, x, edge_index, deg):
        row, col = edge_index[0], edge_index[1]
        x_i, x_j = x[row], x[col]
        q = torch.softmax((x_j - x_i) @ self.u + self.c, dim=-1)  # (E, H)
        out = x.new_zeros(x.shape[0], self.w.shape[-1])
        for h in range(self.w.shape[0]):
            z = x.new_zeros(x.shape[0], x.shape[1])
            z.index_add_(0, row, q[:, h : h + 1] * x_j)
            out = out + z @ self.w[h]
        s = torch.softmax(self.c, dim=0)
        out = out + x @ torch.einsum("h,hio->io", s, self.w)
        return out / (deg + 1.0).unsqueeze(1) + self.b


class TorchGNNModule(torch.nn.Module):
    def __init__(self, c_in, heads=9):
        super().__init__()
        self.l1 = TorchFeaStConv(c_in, 32, heads)
        self.l2 = TorchFeaStConv(32, 64, heads)
        self.l3 = TorchFeaStConv(64, 128, heads)
        self.l4 = TorchFeaStConv(128, 128, heads)
        self.r1 = TorchFeaStConv(128, 64, heads)
        self.r2 = TorchFeaStConv(128, 64, heads)
        self.r3 = TorchFeaStConv(64, 32, heads)
        self.r4 = TorchFeaStConv(64, 32, heads)

    def forward(self, x, levels, clusters, unpools):
        (e1, d1), (e2, d2), (e3, d3) = levels

        def pool(x, cl, n):
            out = x.new_full((n, x.shape[1]), -torch.inf)
            out.index_reduce_(0, cl, x, "amax", include_self=False)
            return torch.nan_to_num(out, neginf=0.0)

        x1 = F.leaky_relu(self.l1(x, e1, d1), 0.2)
        x2 = x1
        for cl, n in clusters[0]:
            x2 = pool(x2, cl, n)
        x2 = F.leaky_relu(self.l2(x2, e2, d2), 0.2)
        x3 = x2
        for cl, n in clusters[1]:
            x3 = pool(x3, cl, n)
        x3 = F.leaky_relu(self.l3(x3, e3, d3), 0.2)
        x3 = F.leaky_relu(self.l4(x3, e3, d3), 0.2)
        u2 = self.r1(x3[unpools[1]], e2, d2)
        x2 = F.leaky_relu(self.r2(torch.cat([x2, u2], 1), e2, d2), 0.2)
        u1 = self.r3(x2[unpools[0]], e1, d1)
        return F.leaky_relu(self.r4(torch.cat([x1, u1], 1), e1, d1), 0.2)


class TorchDualGNN(torch.nn.Module):
    """Reference-twin DualGNN (code/network.py:303-343 semantics): vertex
    U-Net -> residual positions (or force_depth scalar * depth ray,
    code/network.py:326-332) -> differentiable facet rebuild -> facet U-Net
    -> unit normals.  Used both as the measured CPU baseline and as the
    parity oracle (tests/test_reference_parity.py) with injected params."""

    def __init__(self, heads=9, force_depth=False):
        super().__init__()
        self.force_depth = force_depth
        self.gnn_v = TorchGNNModule(6, heads)
        self.fc_v1 = torch.nn.Linear(32, 1024)
        self.fc_v2 = torch.nn.Linear(1024, 1 if force_depth else 3)
        self.gnn_f = TorchGNNModule(12, heads)
        self.fc_f1 = torch.nn.Linear(32, 1024)
        self.fc_f2 = torch.nn.Linear(1024, 3)

    def forward(self, vb, fb, fv, depth_direction=None):
        xyz = vb["x"][:, :3]
        h = self.gnn_v(vb["x"], vb["levels"], vb["clusters"], vb["unpools"])
        d = self.fc_v2(F.leaky_relu(self.fc_v1(h), 0.2))
        if self.force_depth:
            d = d * depth_direction
        vert = d + xyz
        cent = vert[fv].mean(1)
        e1 = vert[fv[:, 1]] - vert[fv[:, 0]]
        e2 = vert[fv[:, 2]] - vert[fv[:, 0]]
        n = torch.cross(e1, e2, dim=1)
        n = F.normalize(n, dim=1)
        xf = torch.cat([fb["x"], cent, n], 1)
        h = self.gnn_f(xf, fb["levels"], fb["clusters"], fb["unpools"])
        nf = self.fc_f2(F.leaky_relu(self.fc_f1(h), 0.2))
        return vert, F.normalize(nf, dim=1)


def branch_to_torch(b):
    levels = []
    sizes = [b.n_nodes] + [s.n_out for s in b.specs]
    eis = [b.edge_index] + [s.edge_index for s in b.specs]
    for ei, n in zip(eis, sizes):
        ei_t = torch.from_numpy(np.asarray(ei)).long()
        deg = torch.bincount(ei_t[0], minlength=n).float()
        levels.append((ei_t, deg))
    clusters = []
    for s in b.specs:
        clusters.append(
            [
                (torch.from_numpy(np.asarray(c)).long(), int(n))
                for c, n in zip(s.step_clusters, s.step_sizes)
            ]
        )
    unpools = [torch.from_numpy(np.asarray(s.unpool)).long() for s in b.specs]
    return dict(
        x=torch.from_numpy(np.asarray(b.x)).float(),
        y=None if b.y is None else torch.from_numpy(np.asarray(b.y)).float(),
        levels=levels,
        clusters=clusters,
        unpools=unpools,
    )


def run_baseline(subdiv=5, steps=3, heads=9, threads=None):
    from geobignn_tpu.data import synth
    from geobignn_tpu.data.builder import BuildConfig, build_raw

    if threads:
        torch.set_num_threads(threads)
    m_o = synth.icosphere(subdiv)
    m_n = synth.add_noise(m_o, 0.2, seed=0)
    bv, bf, meta = build_raw(m_n, m_o, BuildConfig())
    vb, fb = branch_to_torch(bv), branch_to_torch(bf)
    fv = torch.from_numpy(meta["fv_indices"].astype(np.int64))

    model = TorchDualGNN(heads)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    def step():
        opt.zero_grad()
        vert, norm = model(vb, fb, fv)
        loss = (vert - vb["y"]).abs().sum(1).mean()
        nfy = fb["y"]
        loss = loss + (norm - nfy).abs().sum(1).mean()
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps

    msgs = messages_per_step(bv) + messages_per_step(bf)
    return dict(
        steps_per_s=1.0 / dt,
        step_seconds=dt,
        edges_per_s=msgs / dt,
        messages_per_step=msgs,
        faces=m_n.n_faces,
    )


def messages_per_step(b) -> int:
    """Edge messages per forward: 3 convs at level1/2, 2 at level3."""
    e1 = b.edge_index.shape[1]
    e2 = b.specs[0].edge_index.shape[1]
    e3 = b.specs[1].edge_index.shape[1]
    return 3 * e1 + 3 * e2 + 2 * e3


if __name__ == "__main__":
    import os
    import sys

    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    r = run_baseline(subdiv=subdiv, steps=steps)
    print(json.dumps(r))
    # multi-entry cache keyed by faces (bench.py reads {"entries": [...]};
    # the legacy single-entry format is still accepted there)
    path = "BENCH_BASELINE.json"
    entries = []
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        entries = old.get("entries", [old] if "faces" in old else [])
    entries = [e for e in entries if e.get("faces") != r["faces"]] + [r]
    with open(path, "w") as f:
        json.dump({"entries": sorted(entries, key=lambda e: e["faces"])}, f,
                  indent=2)
