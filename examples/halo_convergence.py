"""Halo-mode convergence evidence (VERDICT r2 weak #6 / next-round #5).

Per-step gradient parity of the halo-sharded training path is pinned in
tests/test_halo_train.py, but pooling in halo mode is PARTITION-
CONSTRAINED (matching never crosses partition boundaries; hierarchies are
built per shard with reorder=False), so the halo model is a slightly
different — not bitwise-identical — member of the same family.  This
script shows the training CURVES track: the same small corpus is trained
(a) single-chip and (b) halo_parts=8 on the virtual CPU mesh, same seed,
same protocol, and the eval error_f trajectories + finals are compared.

Run (CPU, 8 virtual devices):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \\
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
  PYTHONPATH=/root/repo python examples/halo_convergence.py --epochs 60

Artifacts: docs/halo_conv/{single,halo}_curve.jsonl + summary.json.
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
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "halo_conv",
)


def corpus():
    shapes = [
        ("sphere", synth.icosphere(4)),
        ("torus", synth.torus(48, 24)),
        ("cube", synth.cube(14)),
        ("cyl", synth.cylinder(48, 24)),
    ]
    train, evals = [], []
    for i, (name, m_o) in enumerate(shapes):
        for j, sig in enumerate((0.15, 0.3)):
            train.append((synth.add_noise(m_o, sig, seed=100 + 7 * i + j), m_o))
        evals.append((synth.add_noise(m_o, 0.2, seed=900 + i), m_o))
    return train, evals


def run(mode: str, epochs: int, seed: int):
    from geobignn_tpu.config import Config
    from geobignn_tpu.train.logging import MetricLogger

    train_pairs, eval_pairs = corpus()
    os.makedirs(OUT_DIR, exist_ok=True)
    curve_path = os.path.join(OUT_DIR, f"{mode}_curve.jsonl")

    cfg = Config(
        data_type="HaloConv", flag=mode, seed=seed, max_epoch=epochs,
        lr=1e-3, lr_sch="lmd", lr_decay=0.98, lr_step=(20,),
        augment=False, preload=True, granularity=128, batch_size=1,
        halo_parts=8 if mode == "halo" else 0,
    )

    run_dir = os.path.join(OUT_DIR, f"run_{mode}")
    os.makedirs(run_dir, exist_ok=True)
    logger = MetricLogger(os.path.join(run_dir, "metrics.jsonl"),
                          tensorboard=False)

    if mode == "halo":
        from geobignn_tpu.train.halo_trainer import HaloTrainer

        trainer = HaloTrainer(cfg, train_pairs, eval_pairs, run_dir)
    else:
        from geobignn_tpu.data.dataset import InMemoryDataset
        from geobignn_tpu.train.trainer import Trainer

        bc = cfg.build_config()
        trainer = Trainer(
            cfg, InMemoryDataset(train_pairs, bc),
            InMemoryDataset(eval_pairs, bc), run_dir,
        )

    def report(tr, train_m, eval_m):
        if eval_m and tr.epoch % 5 == 0:
            print(f"{mode} epoch {tr.epoch:>3} eval error_f "
                  f"{eval_m['error_f']:.3f}", flush=True)

    best = trainer.fit(logger, report)
    logger.close()

    rows = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r.get("split") == "test":
                rows.append(dict(epoch=r["epoch"], error_f=r["error_f"],
                                 error_v=r.get("error_v")))
    with open(curve_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"{mode}: best eval error_f {best:.4f}; curve -> {curve_path}")
    return best


def compare():
    def load(mode):
        path = os.path.join(OUT_DIR, f"{mode}_curve.jsonl")
        return [json.loads(l) for l in open(path)]

    s, h = load("single"), load("halo")
    sd = {r["epoch"]: r["error_f"] for r in s}
    hd = {r["epoch"]: r["error_f"] for r in h}
    marks = sorted(set(sd) & set(hd))
    print("| epoch | single-chip error_f | halo(8) error_f |")
    print("|---|---|---|")
    for m in marks[:: max(1, len(marks) // 12)] + [marks[-1]]:
        print(f"| {m} | {sd[m]:.3f} | {hd[m]:.3f} |")
    tail = min(10, len(marks) // 3)
    s_tail = np.mean([sd[m] for m in marks[-tail:]])
    h_tail = np.mean([hd[m] for m in marks[-tail:]])
    summary = dict(
        single_final_mean=round(float(s_tail), 4),
        halo_final_mean=round(float(h_tail), 4),
        rel_gap=round(float(abs(s_tail - h_tail) / s_tail), 4),
        epochs=marks[-1] + 1,
    )
    with open(os.path.join(OUT_DIR, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["single", "halo", "compare", "all"],
                    nargs="?", default="all")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    if args.phase in ("single", "halo"):
        run(args.phase, args.epochs, args.seed)
    elif args.phase == "compare":
        compare()
    else:
        run("single", args.epochs, args.seed)
        run("halo", args.epochs, args.seed)
        compare()
