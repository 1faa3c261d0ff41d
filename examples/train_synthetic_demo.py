"""End-to-end acceptance demo (BASELINE.json configs 1-2 analog).

Builds a CNR-Synthetic-style corpus from analytic shapes (smooth, sharp,
and mixed-feature surfaces x 3 noise levels), trains the DualGNN on the
active backend, then denoises held-out shapes and reports angular errors
against the noisy baseline.

Run (TPU):  PYTHONPATH=/root/repo:/root/.axon_site python examples/train_synthetic_demo.py
Artifacts:  run dir under --workdir (metrics.jsonl, checkpoints, results)
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from geobignn_tpu import geometry, meshio
from geobignn_tpu.config import Config
from geobignn_tpu.data import synth
from geobignn_tpu.data.dataset import DualDataset
from geobignn_tpu.infer.predict import predict_dir
from geobignn_tpu.train.trainer import Trainer, make_run_dir
from geobignn_tpu.train.logging import MetricLogger

TRAIN_SHAPES = {
    "SphereL": lambda: synth.icosphere(4),
    "Torus": lambda: synth.torus(64, 32),
    "Cube": lambda: synth.cube(16),
    "Cylinder": lambda: synth.cylinder(48, 24),
    "SphereS": lambda: synth.icosphere(3),
    "TorusS": lambda: synth.torus(40, 20, r_minor=0.5),
}
TEST_SHAPES = {
    "CubeT": lambda: synth.cube(12),
    "SphereT": lambda: synth.icosphere(4, radius=1.3),
    "CylinderT": lambda: synth.cylinder(40, 20, radius=0.7),
}
NOISE = {1: 0.1, 2: 0.2, 3: 0.3}


def write_corpus(root: str) -> None:
    for split, shapes in [("train", TRAIN_SHAPES), ("test", TEST_SHAPES)]:
        nd = os.path.join(root, "Synthetic", split, "noisy")
        od = os.path.join(root, "Synthetic", split, "original")
        os.makedirs(nd, exist_ok=True)
        os.makedirs(od, exist_ok=True)
        for i, (name, fn) in enumerate(shapes.items()):
            m = fn()
            meshio.write_obj(os.path.join(od, f"{name}.obj"), m.points, m.fv_indices)
            for lvl, sig in NOISE.items():
                n = synth.add_noise(m, sig, seed=100 * i + lvl)
                meshio.write_obj(
                    os.path.join(nd, f"{name}_n{lvl}.obj"), n.points, n.fv_indices
                )
        with open(os.path.join(root, "Synthetic", f"{split}_list.txt"), "w") as f:
            f.write("\n".join(shapes) + "\n")


def noisy_baseline_angle(root: str) -> float:
    """Face-weighted angular error of the NOISY meshes vs GT (what the
    model must beat)."""
    tot = werr = 0
    d = os.path.join(root, "Synthetic", "test")
    for name in TEST_SHAPES:
        orig = meshio.read_obj(os.path.join(d, "original", f"{name}.obj"))
        no = geometry.face_normals_np(orig.points, orig.fv_indices)
        for lvl in NOISE:
            noisy = meshio.read_obj(os.path.join(d, "noisy", f"{name}_n{lvl}.obj"))
            nn = geometry.face_normals_np(noisy.points, noisy.fv_indices)
            err = ((nn - no) ** 2).sum(1)
            ang = np.degrees(np.arccos(np.clip(1 - err / 2, -1, 1)))
            tot += ang.size
            werr += ang.sum()
    return werr / tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/geobignn_demo")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    root = os.path.join(args.workdir, "dataset")
    write_corpus(root)
    base_angle = noisy_baseline_angle(root)
    print(f"noisy baseline angular error: {base_angle:.3f} deg", flush=True)

    cfg = Config(
        data_type="Synthetic", flag="demo", dataset_dir=root,
        log_dir=os.path.join(args.workdir, "log"),
        max_epoch=args.epochs, lr=args.lr, lr_sch="lmd",
        lr_decay=0.8, lr_step=(50,), seed=11, granularity=128,
    )
    bc = cfg.build_config()
    train_ds = DualDataset(root, "Synthetic", "train", "train_list.txt", build_cfg=bc)
    eval_ds = DualDataset(root, "Synthetic", "test", "test_list.txt", build_cfg=bc)
    print(f"train {len(train_ds)} / eval {len(eval_ds)} samples", flush=True)

    run_dir = make_run_dir(cfg)
    cfg.to_json(os.path.join(run_dir, "params.json"))
    logger = MetricLogger(os.path.join(run_dir, "metrics.jsonl"))
    tr = Trainer(cfg, train_ds, eval_ds, run_dir)

    t0 = time.time()

    def report(t, train_m, eval_m):
        if t.epoch % 20 == 0 or t.epoch == args.epochs - 1:
            print(
                f"epoch {t.epoch:>4}  train_loss {train_m['loss']:.4f}  "
                f"eval error_v {eval_m['error_v']:.4f}  error_f "
                f"{eval_m['error_f']:.3f} deg  ({train_m['samples_per_s']:.1f} "
                f"samples/s, {time.time()-t0:.0f}s)",
                flush=True,
            )

    best = tr.fit(logger, report)
    print(f"best eval error_f: {best:.3f} deg (noisy baseline {base_angle:.3f})",
          flush=True)

    res = predict_dir(run_dir, dataset_root=root)
    summary = dict(
        noisy_baseline_deg=base_angle,
        best_eval_error_f=float(best),
        angle1=res["angle_mean1"],
        angle2=res["angle_mean2"],
        wall_s=time.time() - t0,
    )
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("SUMMARY:", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
