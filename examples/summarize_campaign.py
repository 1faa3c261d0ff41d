"""Summarize a campaign run: convergence table + per-class results.

Reads metrics.jsonl and campaign_results.json from the newest (or given)
SynthCampaign run dir and prints the markdown blocks that go into
docs/RESULTS.md (VERDICT r1 next-round item 5: convergence curve with a
flat tail + per-class angle1/angle2/Hausdorff table).

Usage: python examples/summarize_campaign.py [run_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main():
    if len(sys.argv) > 1:
        run_dir = sys.argv[1]
    else:
        runs = glob.glob("log/GeoBi-GNN_SynthCampaign_campaign/*/")
        if not runs:
            sys.exit("no campaign run dirs under "
                     "log/GeoBi-GNN_SynthCampaign_campaign/ — pass one "
                     "explicitly: summarize_campaign.py RUN_DIR")
        run_dir = max(runs, key=os.path.getmtime)  # newest by mtime, not
        # by lexicographic name
    print(f"run: {run_dir}\n")

    test_rows, train_rows = [], []
    with open(os.path.join(run_dir, "metrics.jsonl")) as fh:
        for line in fh:
            r = json.loads(line)
            if r.get("split") == "test":
                test_rows.append(r)
            elif r.get("split") == "train":
                train_rows.append(r)

    eps = [r["edges_per_s"] for r in train_rows if r.get("edges_per_s")]
    if eps:  # the north-star throughput metric, from production logs
        print(f"train throughput: mean {sum(eps)/len(eps)/1e6:.1f}e6 edges/s "
              f"(last {eps[-1]/1e6:.1f}e6) over {len(eps)} epochs\n")

    print("| epoch | eval error_f (deg) | eval error_v |")
    print("|---|---|---|")
    marks = [0, 10, 25, 50, 75, 100, 150, 200, 250, 300, 350, 400, 450,
             len(test_rows) - 1]
    seen = set()
    for m in marks:
        if 0 <= m < len(test_rows) and m not in seen:
            seen.add(m)
            r = test_rows[m]
            print(f"| {r['epoch']} | {r['error_f']:.3f} | {r['error_v']:.4f} |")
    best = min(test_rows, key=lambda r: r["error_f"])
    print(f"\nbest eval error_f {best['error_f']:.3f} deg at epoch {best['epoch']}")
    tail = [r["error_f"] for r in test_rows[-50:]]
    print(f"tail (last 50 epochs): mean {sum(tail)/len(tail):.3f}, "
          f"min {min(tail):.3f}, max {max(tail):.3f}")

    res_path = os.path.join(run_dir, "campaign_results.json")
    if os.path.exists(res_path):
        res = json.load(open(res_path))
        print("\ncorpus (face-weighted):", json.dumps(res["corpus"]))
        print("\n| class | n | noisy (deg) | angle1 | angle2 | Hausdorff/mel |")
        print("|---|---|---|---|---|---|")
        for k, v in res["per_class"].items():
            print(f"| {k} | {v['n']} | {v['angle_noisy']:.2f} | "
                  f"{v['angle1']:.2f} | {v['angle2']:.2f} | {v['hausdorff']:.3f} |")
        print("\n| shape | class | faces | noisy | angle1 | angle2 | H/mel |")
        print("|---|---|---|---|---|---|---|")
        for r in res["per_shape"]:
            print(f"| {r['name']} | {r['klass']} | {r['faces']} | "
                  f"{r['angle_noisy']:.2f} | {r['angle1']:.2f} | "
                  f"{r['angle2']:.2f} | {r['hausdorff']:.3f} |")


if __name__ == "__main__":
    main()
