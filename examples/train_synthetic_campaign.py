"""Reference-protocol accuracy campaign on a synthetic corpus.

VERDICT r1 missing #2: the round-1 quality evidence was one time-boxed
demo (6 shapes, ~180 epochs).  This campaign mirrors the reference's
training protocol (code/train_dual.py:187-278; corpus scale of the CNR
Synthetic split: 21 train shapes x 3 noise levels) on generated shapes —
the actual CNR meshes are external downloads absent from both repos:

  * 22 TRAIN base shapes x 3 noise levels (sigma 0.1/0.2/0.3 x mean edge
    length) = 66 training samples;
  * 8 HELD-OUT base shapes x 3 levels = 24 eval samples;
  * classes: smooth (spheres/ellipsoids/bumpy), genus-1 (tori), sharp
    CAD-like (cubes/cuboids), mixed (cylinders);
  * >=500 epochs, full eval pass per epoch, SO(3) augmentation, lmd decay,
    best-checkpoint on eval normal error, auto-resume on restart;
  * final per-shape evaluation: angle1 (predicted normals), angle2 (after
    60-iter position integration, reference test_dual.py:69-86), and
    Hausdorff-style nearest-vertex distance / mean GT edge length.

Run (TPU):  PYTHONPATH=/root/repo:/root/.axon_site \\
            python examples/train_synthetic_campaign.py --epochs 500
Outputs:    log/GeoBi-GNN_SynthCampaign_*/<ts>/{metrics.jsonl, ckpt_*.pkl,
            campaign_results.json}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geobignn_tpu.config import Config
from geobignn_tpu.data import synth
from geobignn_tpu.data.dataset import InMemoryDataset
from geobignn_tpu.train.trainer import Trainer, find_resumable_run, make_run_dir
from geobignn_tpu.train.logging import MetricLogger

NOISE_LEVELS = (0.1, 0.2, 0.3)


def train_shapes():
    """22 base shapes, grouped by class (all ~4k-20k faces so one merged
    SizePlan stays tight)."""
    s = []
    # smooth: spheres / ellipsoids / bumpy organics
    s.append(("sphere4", "smooth", synth.icosphere(4)))
    s.append(("sphere5", "smooth", synth.icosphere(5)))
    s.append(("ellip_a", "smooth", synth.ellipsoid(4, (1.0, 0.7, 0.85))))
    s.append(("ellip_b", "smooth", synth.ellipsoid(5, (1.4, 1.0, 0.6))))
    s.append(("bumpy_a", "smooth", synth.bumpy_sphere(4, 10, 0.12, seed=1)))
    s.append(("bumpy_b", "smooth", synth.bumpy_sphere(5, 14, 0.18, seed=2)))
    s.append(("bumpy_c", "smooth", synth.bumpy_sphere(4, 20, 0.10, seed=3)))
    # genus-1
    s.append(("torus_a", "torus", synth.torus(72, 36)))
    s.append(("torus_b", "torus", synth.torus(96, 48, 1.0, 0.25)))
    s.append(("torus_c", "torus", synth.torus(120, 40, 1.0, 0.45)))
    s.append(("torus_d", "torus", synth.torus(64, 64, 1.0, 0.5)))
    # sharp CAD-like
    s.append(("cube_a", "sharp", synth.cube(20)))
    s.append(("cube_b", "sharp", synth.cube(28)))
    s.append(("cube_c", "sharp", synth.cube(36)))
    s.append(("cuboid_a", "sharp", synth.cuboid(24, (1.0, 0.6, 1.4))))
    s.append(("cuboid_b", "sharp", synth.cuboid(32, (0.5, 1.0, 1.0))))
    s.append(("cuboid_c", "sharp", synth.cuboid(20, (1.2, 1.2, 0.4))))
    # mixed smooth/sharp
    s.append(("cyl_a", "mixed", synth.cylinder(72, 36)))
    s.append(("cyl_b", "mixed", synth.cylinder(96, 48, 0.35, 2.4)))
    s.append(("cyl_c", "mixed", synth.cylinder(64, 64, 0.7, 1.2)))
    s.append(("cyl_d", "mixed", synth.cylinder(120, 30, 0.5, 3.0)))
    s.append(("cyl_e", "mixed", synth.cylinder(48, 72, 0.25, 2.0)))
    return s


def eval_shapes():
    """8 held-out base shapes — same classes, different parameters/seeds."""
    s = []
    s.append(("SphereT", "smooth", synth.icosphere(4, radius=1.2)))
    s.append(("EllipT", "smooth", synth.ellipsoid(4, (0.8, 1.1, 0.65))))
    s.append(("BumpyT", "smooth", synth.bumpy_sphere(4, 16, 0.15, seed=77)))
    s.append(("TorusT", "torus", synth.torus(84, 42, 1.0, 0.3)))
    s.append(("CubeT", "sharp", synth.cube(24)))
    s.append(("CuboidT", "sharp", synth.cuboid(28, (1.3, 0.5, 1.0))))
    s.append(("CylT", "mixed", synth.cylinder(80, 40, 0.45, 1.8)))
    s.append(("CylT2", "mixed", synth.cylinder(56, 56, 0.6, 2.6)))
    return s


def make_pairs(shapes, seed0: int):
    pairs, names = [], []
    for i, (name, klass, m_o) in enumerate(shapes):
        for j, sig in enumerate(NOISE_LEVELS):
            m_n = synth.add_noise(m_o, sig, seed=seed0 + 17 * i + j)
            pairs.append((m_n, m_o))
            names.append((f"{name}_n{j + 1}", klass))
    return pairs, names


def final_eval(cfg, params, eval_pairs, eval_names):
    """Per-shape angle1/angle2/Hausdorff at reference protocol."""
    import jax.numpy as jnp

    from geobignn_tpu.infer.predict import Predictor, _angular_error
    from geobignn_tpu.models.losses import nearest_distance
    from geobignn_tpu import geometry

    pred = Predictor(cfg, params)
    rows = []
    for (m_n, m_o), (name, klass) in zip(eval_pairs, eval_names):
        gt_n = geometry.face_normals_np(m_o.points, m_o.fv_indices)
        noisy_n = geometry.face_normals_np(m_n.points, m_n.fv_indices)
        vp, np_pred = pred.predict_mesh(m_n)
        angle1 = _angular_error(np_pred, gt_n)
        v_final, _ = pred.denoise(m_n, n_update_iters=60)
        n_final = geometry.face_normals_np(v_final, m_n.fv_indices)
        angle2 = _angular_error(n_final, gt_n)
        mel = geometry.mean_edge_length_np(m_o.points, m_o.ev_indices)
        haus = float(
            np.asarray(
                nearest_distance(jnp.asarray(v_final), jnp.asarray(m_o.points))
            ).max()
        ) / mel
        rows.append(dict(
            name=name, klass=klass, faces=int(m_n.n_faces),
            angle_noisy=round(_angular_error(noisy_n, gt_n), 3),
            angle1=round(angle1, 3), angle2=round(angle2, 3),
            hausdorff=round(haus, 4),
        ))
        print(f"  {name:>12} [{klass:6}] noisy {rows[-1]['angle_noisy']:6.2f} "
              f"-> angle1 {angle1:6.2f}  angle2 {angle2:6.2f}  "
              f"H {haus:.3f}", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--flag", default="campaign")
    args = ap.parse_args()

    from geobignn_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = Config(
        data_type="SynthCampaign", flag=args.flag, seed=args.seed,
        max_epoch=args.epochs, lr=args.lr, lr_sch="lmd", lr_decay=0.98,
        lr_step=(20,), augment=True, preload=True, granularity=128,
        auto_resume=True,
    )

    print("building corpus ...", flush=True)
    train_pairs, train_names = make_pairs(train_shapes(), seed0=1000)
    eval_pairs, eval_names = make_pairs(eval_shapes(), seed0=9000)
    print(f"train {len(train_pairs)} samples, eval {len(eval_pairs)}", flush=True)

    bc = cfg.build_config()
    train_ds = InMemoryDataset(train_pairs, bc)
    eval_ds = InMemoryDataset(eval_pairs, bc)
    print(f"plans merged: v n1={train_ds.plan.v.n1} f n1={train_ds.plan.f.n1}",
          flush=True)

    resume = find_resumable_run(cfg)
    run_dir = resume or make_run_dir(cfg)
    cfg.to_json(os.path.join(run_dir, "params.json"))
    print("run_dir:", run_dir, flush=True)

    trainer = Trainer(cfg, train_ds, eval_ds, run_dir)
    if resume:
        trainer.restore(os.path.join(resume, "ckpt_last.pkl"))
        print(f"resumed at epoch {trainer.epoch}", flush=True)
    logger = MetricLogger(os.path.join(run_dir, "metrics.jsonl"))

    def report(tr, train_m, eval_m):
        m = eval_m or train_m
        if tr.epoch % 5 == 0 or m["error_f"] <= tr.best_error:
            print(
                f"epoch {tr.epoch:>4}  train loss {train_m['loss']:.4f} "
                f"({train_m['samples_per_s']:.1f} samp/s)  eval error_v "
                f"{m['error_v']:.4f} error_f {m['error_f']:.3f} deg  "
                f"best {min(tr.best_error, m['error_f']):.3f}",
                flush=True,
            )

    best = trainer.fit(logger, report)
    logger.close()
    print(f"training done; best eval error_f {best:.3f} deg", flush=True)

    # final per-shape eval with the BEST checkpoint
    from geobignn_tpu.train import checkpoint as ckpt

    best_params, _, _ = ckpt.load_checkpoint(
        os.path.join(run_dir, "ckpt_best.pkl")
    )
    print("final per-shape evaluation (best ckpt):", flush=True)
    rows = final_eval(cfg, best_params, eval_pairs, eval_names)

    agg: dict = {}
    for r in rows:
        a = agg.setdefault(r["klass"], dict(n=0, f=0, a0=0.0, a1=0.0, a2=0.0, h=0.0))
        a["n"] += 1
        a["f"] += r["faces"]
        a["a0"] += r["angle_noisy"] * r["faces"]
        a["a1"] += r["angle1"] * r["faces"]
        a["a2"] += r["angle2"] * r["faces"]
        a["h"] += r["hausdorff"] * r["faces"]
    summary = {
        k: dict(
            n=v["n"], angle_noisy=round(v["a0"] / v["f"], 3),
            angle1=round(v["a1"] / v["f"], 3),
            angle2=round(v["a2"] / v["f"], 3),
            hausdorff=round(v["h"] / v["f"], 4),
        )
        for k, v in agg.items()
    }
    tot_f = sum(r["faces"] for r in rows)
    corpus = dict(
        angle_noisy=round(sum(r["angle_noisy"] * r["faces"] for r in rows) / tot_f, 3),
        angle1=round(sum(r["angle1"] * r["faces"] for r in rows) / tot_f, 3),
        angle2=round(sum(r["angle2"] * r["faces"] for r in rows) / tot_f, 3),
        hausdorff=round(sum(r["hausdorff"] * r["faces"] for r in rows) / tot_f, 4),
    )
    out = dict(
        epochs=trainer.epoch + 1, best_eval_error_f=best,
        n_train=len(train_pairs), n_eval=len(eval_pairs),
        corpus=corpus, per_class=summary, per_shape=rows,
    )
    with open(os.path.join(run_dir, "campaign_results.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(dict(corpus=corpus, per_class=summary), indent=2))
    print("results ->", os.path.join(run_dir, "campaign_results.json"))


if __name__ == "__main__":
    main()
