"""Command-line entry points.

Mirrors the reference's invocation surface (run_py*.bat:
`python train_dual.py --data_type=Synthetic --gpu=0 --flag=x --lr_sch=auto ...`)
as subcommands of one module:

    python -m geobignn_tpu train  --data_type=Synthetic --flag=x [--k=v ...]
    python -m geobignn_tpu infer  --run_dir=log/.../timestamp [--data_dir=...]
    python -m geobignn_tpu eval   --result_dir=... --original_dir=...

Unknown `--key=value` pairs are accepted and applied onto the Config
(typed via json parsing — replacing the reference's `eval` escape hatch,
code/train_dual.py:81-86, without arbitrary code execution).
"""

from __future__ import annotations

import argparse
import json
import sys


def _apply_extras(cfg_dict: dict, extras: list[str]) -> dict:
    import dataclasses

    from geobignn_tpu.config import Config

    known = {f.name for f in dataclasses.fields(Config)}
    for arg in extras:
        if not arg.startswith("--") or "=" not in arg:
            raise SystemExit(f"unrecognized argument: {arg}")
        k, v = arg[2:].split("=", 1)
        if k not in known:
            raise SystemExit(
                f"unknown config key '--{k}' (typo?); valid keys: "
                + ", ".join(sorted(known))
            )
        try:
            cfg_dict[k] = json.loads(v)
        except json.JSONDecodeError:
            cfg_dict[k] = v
    return cfg_dict


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    parser = argparse.ArgumentParser(prog="geobignn_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train")
    p_train.add_argument("--data_type", required=True)
    p_train.add_argument("--flag", default="run")
    p_train.add_argument("--dataset_dir", default="dataset")
    p_train.add_argument("--config", default=None, help="JSON config file")

    p_inf = sub.add_parser("infer")
    p_inf.add_argument("--run_dir", required=True)
    p_inf.add_argument("--data_dir", default=None)
    p_inf.add_argument("--dataset_root", default=None)
    p_inf.add_argument("--sub_size", type=int, default=None)
    p_inf.add_argument("--halo_parts", type=int, default=None,
                       help="node-partition each mesh over this many chips "
                       "(halo-sharded whole-mesh inference) instead of "
                       "submesh stitching")
    p_inf.add_argument("--halo_banded", action="store_true",
                       help="run the halo convs through the banded Pallas "
                       "kernels (RCM-ordered shards)")

    p_ev = sub.add_parser("eval")
    p_ev.add_argument("--result_dir", required=True)
    p_ev.add_argument("--original_dir", required=True)

    # one-command accuracy campaign at the reference protocol (VERDICT r4
    # next #6): train on <dataset_dir>/<data_type>/train (train_list.txt
    # manifest), denoise the manifest-selected test split, write
    # ErrorInfo_h.txt + campaign_summary.json.  The day the CNR/Kinect
    # corpora are dropped into dataset/, the full parity run is:
    #   python -m geobignn_tpu campaign --data_type=Synthetic
    p_cmp = sub.add_parser(
        "campaign",
        help="train + test-split inference + corpus eval in one command "
             "on a reference-layout dataset dir",
    )
    p_cmp.add_argument("--data_type", required=True)
    p_cmp.add_argument("--flag", default="campaign")
    p_cmp.add_argument("--dataset_dir", default="dataset")
    p_cmp.add_argument("--config", default=None, help="JSON config file")

    args, extras = parser.parse_known_args(argv)

    if args.cmd == "train":
        from geobignn_tpu.config import Config
        from geobignn_tpu.train.trainer import train

        base = {}
        if args.config:
            with open(args.config) as f:
                base = json.load(f)
        base.update(
            data_type=args.data_type, flag=args.flag, dataset_dir=args.dataset_dir
        )
        cfg = Config.from_dict(_apply_extras(base, extras))
        run_dir = train(cfg)
        from geobignn_tpu.infer.predict import predict_dir

        predict_dir(run_dir, dataset_root=cfg.dataset_dir)
    elif args.cmd == "infer":
        from geobignn_tpu.infer.predict import predict_dir

        predict_dir(args.run_dir, args.data_dir, args.dataset_root, args.sub_size,
                    halo_parts=args.halo_parts, halo_banded=args.halo_banded)
    elif args.cmd == "eval":
        from geobignn_tpu.infer.evaluate import eval_denoising_result

        eval_denoising_result(args.result_dir, args.original_dir)
    elif args.cmd == "campaign":
        import os

        from geobignn_tpu.config import Config
        from geobignn_tpu.infer.evaluate import eval_denoising_result
        from geobignn_tpu.infer.predict import predict_dir
        from geobignn_tpu.train.trainer import train

        base = {}
        if args.config:
            with open(args.config) as f:
                base = json.load(f)
        base.update(
            data_type=args.data_type, flag=args.flag,
            dataset_dir=args.dataset_dir,
        )
        cfg = Config.from_dict(_apply_extras(base, extras))
        run_dir = train(cfg)
        rep = predict_dir(run_dir, dataset_root=cfg.dataset_dir)
        result_dir = os.path.join(
            cfg.dataset_dir, cfg.data_type, "test", f"result_{cfg.flag}")
        orig_dir = os.path.join(
            cfg.dataset_dir, cfg.data_type, "test", "original")
        ev = eval_denoising_result(result_dir, orig_dir)
        summary = dict(run_dir=run_dir, **(rep or {}))
        if isinstance(ev, dict):
            summary["corpus"] = ev.get("corpus")
            summary["eval_rows"] = ev.get("rows")
        out = os.path.join(run_dir, "campaign_summary.json")
        with open(out, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"campaign summary -> {out}")
        return summary


if __name__ == "__main__":
    main()
