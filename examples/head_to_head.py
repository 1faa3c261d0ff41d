"""Trained-accuracy head-to-head: JAX/TPU framework vs the torch twin.

VERDICT r2 missing #2 / next-round #4: per-layer parity is pinned
(tests/test_reference_parity.py), but nothing showed that a reference-style
training loop (code/train_dual.py:187-278 semantics, implemented in plain
torch by bench_baseline_torch.TorchDualGNN) converges to a comparable
number on the SAME corpus.  This script trains BOTH frameworks under an
identical reduced protocol and emits side-by-side eval curves + final
angle1/angle2.

Shared protocol (both phases):
  * corpus: 4 train base shapes (one per class) x 3 noise levels = 12
    train samples; 4 held-out shapes x 3 levels = 12 eval; built by the
    SAME host pipeline (data/builder.build_raw — identical graphs, weights
    and seeded pooling hierarchies for both frameworks);
  * dual L1 loss, Adam(lr 1e-3), lmd schedule lr*0.98^(epoch/20) stepped
    per epoch (reference default), per-sample optimizer steps, seeded
    shuffling, SO(3) rotation augmentation, eval every 2 epochs,
    best-checkpoint on eval error_f;
  * final: per-mesh angle1 (predicted normals) and angle2 (normals after
    the 60-iteration position integration, reference test_dual.py:69-86).

Phases run separately (the torch phase is CPU-only and slow; run it in the
background):
    python examples/head_to_head.py jax   --epochs 80   # on TPU
    JAX_PLATFORMS=cpu python examples/head_to_head.py torch --epochs 80
    python examples/head_to_head.py report
Artifacts land in docs/h2h/{jax,torch}_curve.jsonl + _final.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geobignn_tpu.data import synth

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "h2h"
)
NOISE_LEVELS = (0.1, 0.2, 0.3)
EVAL_EVERY = 2
LR = 1e-3
LMD_DECAY, LMD_STEP = 0.98, 20


def corpus():
    train = [
        ("sphere4", synth.icosphere(4)),
        ("torus", synth.torus(48, 24)),
        ("cube", synth.cube(14)),
        ("cyl", synth.cylinder(48, 24)),
    ]
    evals = [
        ("SphereT", synth.icosphere(4, radius=1.2)),
        ("TorusT", synth.torus(40, 20, 1.0, 0.3)),
        ("CubeT", synth.cube(12)),
        ("CylT", synth.cylinder(40, 20, 0.45, 1.8)),
    ]

    def expand(shapes, seed0):
        pairs, names = [], []
        for i, (name, m_o) in enumerate(shapes):
            for j, sig in enumerate(NOISE_LEVELS):
                m_n = synth.add_noise(m_o, sig, seed=seed0 + 17 * i + j)
                pairs.append((m_n, m_o))
                names.append(f"{name}_n{j + 1}")
        return pairs, names

    return expand(train, 1000), expand(evals, 9000)


def lr_at(epoch: int) -> float:
    return LR * LMD_DECAY ** (epoch / LMD_STEP)


def final_rows(eval_pairs, eval_names, predict_fn):
    """predict_fn(mesh_n) -> (vert_denoised (N,3) np, face_normals (F,3) np).
    angle2 runs the SAME deterministic position integration for both
    frameworks (infer/predict.update_positions, 60 iters)."""
    import jax.numpy as jnp

    from geobignn_tpu import geometry
    from geobignn_tpu.infer.predict import _angular_error, update_positions

    rows = []
    for (m_n, m_o), name in zip(eval_pairs, eval_names):
        gt_n = geometry.face_normals_np(m_o.points, m_o.fv_indices)
        vp, np_pred = predict_fn(m_n)
        angle1 = _angular_error(np_pred, gt_n)
        v_final = np.asarray(
            update_positions(
                jnp.asarray(vp), jnp.asarray(m_n.fv_indices),
                jnp.asarray(m_n.vf_indices), jnp.asarray(np_pred), n_iter=60,
            )
        )
        n_final = geometry.face_normals_np(v_final, m_n.fv_indices)
        angle2 = _angular_error(n_final, gt_n)
        noisy = _angular_error(
            geometry.face_normals_np(m_n.points, m_n.fv_indices), gt_n
        )
        rows.append(dict(name=name, faces=int(m_n.n_faces),
                         angle_noisy=round(noisy, 3),
                         angle1=round(angle1, 3), angle2=round(angle2, 3)))
        print(f"  {name:>12} noisy {noisy:6.2f} -> angle1 {angle1:6.2f} "
              f"angle2 {angle2:6.2f}", flush=True)
    tot = sum(r["faces"] for r in rows)
    corpus_row = {
        k: round(sum(r[k] * r["faces"] for r in rows) / tot, 3)
        for k in ("angle_noisy", "angle1", "angle2")
    }
    return rows, corpus_row


# --------------------------------------------------------------------------
# torch phase
# --------------------------------------------------------------------------

def run_torch(epochs: int, seed: int):
    import torch

    from bench_baseline_torch import TorchDualGNN, branch_to_torch
    from geobignn_tpu.data.builder import BuildConfig, build_raw

    torch.manual_seed(seed)
    torch.set_num_threads(os.cpu_count() or 2)
    (train_pairs, _), (eval_pairs, eval_names) = corpus()
    bc = BuildConfig()

    def build(pairs):
        out = []
        for m_n, m_o in pairs:
            bv, bf, meta = build_raw(m_n, m_o, bc)
            out.append((branch_to_torch(bv), branch_to_torch(bf),
                        torch.from_numpy(meta["fv_indices"].astype(np.int64))))
        return out

    print("building corpus (torch) ...", flush=True)
    train = build(train_pairs)
    evals = build(eval_pairs)

    model = TorchDualGNN()
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    rng = np.random.default_rng(seed)

    def rotate(vb, fb):
        """Fresh SO(3) rotation of positions/normals/targets (the
        RandomRotate augmentation, reference dataset.py:39-69)."""
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ], dtype=np.float32)
        rt = torch.from_numpy(r.T)

        def rot_branch(b, y_is_normal):
            xb = b["x"]
            x_new = torch.cat([xb[:, :3] @ rt, xb[:, 3:6] @ rt], dim=1)
            out = dict(b)
            out["x"] = x_new
            out["y"] = b["y"] @ rt
            del y_is_normal
            return out

        return rot_branch(vb, False), rot_branch(fb, True)

    os.makedirs(OUT_DIR, exist_ok=True)
    curve_f = open(os.path.join(OUT_DIR, "torch_curve.jsonl"), "w")

    def evaluate():
        model.eval()
        tot_f = err_f = err_v = tot_v = 0.0
        with torch.no_grad():
            for vb, fb, fv in evals:
                vert, norm = model(vb, fb, fv)
                nf = fb["y"].shape[0]
                nv = vb["y"].shape[0]
                d2 = ((norm - fb["y"]) ** 2).sum(1)
                ang = torch.rad2deg(
                    torch.arccos(torch.clamp(1.0 - d2 / 2.0, -1.0, 1.0))
                ).mean()
                ev = (vert - vb["y"]).norm(dim=1).mean()
                err_f += float(ang) * nf
                tot_f += nf
                err_v += float(ev) * nv
                tot_v += nv
        model.train()
        return err_v / tot_v, err_f / tot_f

    best = float("inf")
    best_path = os.path.join(OUT_DIR, "torch_best.pt")
    import time

    for epoch in range(epochs):
        t0 = time.perf_counter()
        for g in opt.param_groups:
            g["lr"] = lr_at(epoch)
        order = rng.permutation(len(train))
        tot_loss = 0.0
        for i in order:
            vb, fb, fv = train[i]
            vb_r, fb_r = rotate(vb, fb)
            opt.zero_grad()
            vert, norm = model(vb_r, fb_r, fv)
            loss = (vert - vb_r["y"]).abs().sum(1).mean() + (
                norm - fb_r["y"]
            ).abs().sum(1).mean()
            loss.backward()
            opt.step()
            tot_loss += float(loss)
        rec = dict(epoch=epoch, loss=tot_loss / len(train),
                   dt=round(time.perf_counter() - t0, 2))
        if epoch % EVAL_EVERY == 0 or epoch == epochs - 1:
            ev, ef = evaluate()
            rec.update(error_v=round(ev, 5), error_f=round(ef, 4))
            if ef < best:
                best = ef
                torch.save(model.state_dict(), best_path)
        curve_f.write(json.dumps(rec) + "\n")
        curve_f.flush()
        if epoch % 5 == 0 or "error_f" in rec:
            print(f"torch epoch {epoch:>3} loss {rec['loss']:.4f} "
                  f"error_f {rec.get('error_f', float('nan')):.3f} "
                  f"best {best:.3f} ({rec['dt']}s)", flush=True)
    curve_f.close()

    model.load_state_dict(torch.load(best_path, weights_only=True))
    model.eval()

    def predict(m_n):
        from geobignn_tpu.data.builder import build_raw as br

        bv, bf, meta = br(m_n, None, bc)
        vb, fb = branch_to_torch(bv), branch_to_torch(bf)
        fv = torch.from_numpy(meta["fv_indices"].astype(np.int64))
        with torch.no_grad():
            vert, norm = model(vb, fb, fv)
        # un-normalize (builder normalized x by centroid/scale)
        vp = np.asarray(vert) / meta["scale"] + meta["centroid"]
        return vp.astype(np.float32), np.asarray(norm).astype(np.float32)

    print("torch final per-shape eval (best ckpt):", flush=True)
    rows, corpus_row = final_rows(eval_pairs, eval_names, predict)
    out = dict(framework="torch-cpu", epochs=epochs,
               best_eval_error_f=round(best, 4), corpus=corpus_row,
               per_shape=rows)
    with open(os.path.join(OUT_DIR, "torch_final.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(corpus_row))


# --------------------------------------------------------------------------
# jax phase
# --------------------------------------------------------------------------

def run_jax(epochs: int, seed: int):
    from geobignn_tpu.config import Config
    from geobignn_tpu.data.dataset import InMemoryDataset
    from geobignn_tpu.train import checkpoint as ckpt
    from geobignn_tpu.train.logging import MetricLogger
    from geobignn_tpu.train.trainer import Trainer, make_run_dir
    from geobignn_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = Config(
        data_type="H2H", flag="h2h", seed=seed, max_epoch=epochs, lr=LR,
        lr_sch="lmd", lr_decay=LMD_DECAY, lr_step=(LMD_STEP,), augment=True,
        preload=True, granularity=128, batch_size=1,
    )
    (train_pairs, _), (eval_pairs, eval_names) = corpus()
    bc = cfg.build_config()
    train_ds = InMemoryDataset(train_pairs, bc)
    eval_ds = InMemoryDataset(eval_pairs, bc)
    run_dir = make_run_dir(cfg)
    print("run_dir:", run_dir, flush=True)

    trainer = Trainer(cfg, train_ds, eval_ds, run_dir)
    logger = MetricLogger(os.path.join(run_dir, "metrics.jsonl"))

    def report(tr, train_m, eval_m):
        if tr.epoch % 5 == 0 and eval_m:
            print(f"jax epoch {tr.epoch:>3} loss {train_m['loss']:.4f} "
                  f"error_f {eval_m['error_f']:.3f} best "
                  f"{min(tr.best_error, eval_m['error_f']):.3f}", flush=True)

    best = trainer.fit(logger, report)
    logger.close()
    print(f"jax best eval error_f {best:.4f}", flush=True)

    os.makedirs(OUT_DIR, exist_ok=True)
    # re-shape the metrics.jsonl test rows into the shared curve format
    with open(os.path.join(OUT_DIR, "jax_curve.jsonl"), "w") as out_f:
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            for line in f:
                r = json.loads(line)
                if r.get("split") == "test":
                    out_f.write(json.dumps(dict(
                        epoch=r["epoch"], error_v=r.get("error_v"),
                        error_f=r.get("error_f"))) + "\n")

    best_params, _, _ = ckpt.load_checkpoint(os.path.join(run_dir, "ckpt_best.pkl"))
    from geobignn_tpu.infer.predict import Predictor

    pred = Predictor(cfg, best_params)

    print("jax final per-shape eval (best ckpt):", flush=True)
    rows, corpus_row = final_rows(eval_pairs, eval_names, pred.predict_mesh)
    out = dict(framework="jax-tpu", epochs=epochs,
               best_eval_error_f=round(best, 4), corpus=corpus_row,
               per_shape=rows)
    with open(os.path.join(OUT_DIR, "jax_final.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(corpus_row))


def report():
    def load(tag):
        fin = json.load(open(os.path.join(OUT_DIR, f"{tag}_final.json")))
        curve = [json.loads(l) for l in
                 open(os.path.join(OUT_DIR, f"{tag}_curve.jsonl"))]
        return fin, [r for r in curve if "error_f" in r]

    jf, jc = load("jax")
    tf, tc = load("torch")
    marks = sorted({r["epoch"] for r in jc} & {r["epoch"] for r in tc})
    sel = [m for i, m in enumerate(marks)
           if i % max(1, len(marks) // 10) == 0 or m == marks[-1]]
    print("| epoch | jax error_f | torch error_f |")
    print("|---|---|---|")
    jd = {r["epoch"]: r["error_f"] for r in jc}
    td = {r["epoch"]: r["error_f"] for r in tc}
    for m in sel:
        print(f"| {m} | {jd[m]:.3f} | {td[m]:.3f} |")
    print()
    print("| | best eval error_f | corpus angle1 | corpus angle2 |")
    print("|---|---|---|---|")
    for tag, fin in (("jax-tpu", jf), ("torch-cpu", tf)):
        print(f"| {tag} | {fin['best_eval_error_f']:.3f} | "
              f"{fin['corpus']['angle1']:.3f} | {fin['corpus']['angle2']:.3f} |")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["jax", "torch", "report"])
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()
    if args.phase == "torch":
        run_torch(args.epochs, args.seed)
    elif args.phase == "jax":
        run_jax(args.epochs, args.seed)
    else:
        report()
