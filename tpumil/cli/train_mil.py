"""Train DSMIL on classic MIL benchmark datasets (musk1/2, elephant, fox,
tiger) — CLI mirror of the reference train_mil.py:112-187."""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train DSMIL on classical MIL datasets (TPU-native)")
    parser.add_argument("--datasets", default="musk1", type=str,
                        help="musk1, musk2, elephant, fox, tiger [musk1]")
    parser.add_argument("--data_file", default=None, type=str,
                        help="Explicit path to an svmlight-like MIL file "
                             "(overrides --datasets lookup)")
    parser.add_argument("--num_feats", default=None, type=int,
                        help="Feature count (required with --data_file)")
    parser.add_argument("--lr", default=2e-4, type=float, help="Initial learning rate [0.0002]")
    parser.add_argument("--num_epoch", default=40, type=int, help="Number of training epochs [40]")
    parser.add_argument("--cv_fold", default=10, type=int, help="Cross validation folds [10]")
    parser.add_argument("--weight_decay", default=5e-3, type=float, help="Weight decay [5e-3]")
    parser.add_argument("--model", default="dsmil", type=str, help="MIL model [dsmil|abmil|meanpool|maxpool]")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--inst_shard", default=0, type=int, metavar="N",
                        help="Shard every bag's instance axis over the "
                             "first N devices (power of two); same "
                             "trajectory as single-device to float "
                             "tolerance [0 = off]")
    parser.add_argument("--device", default="auto", choices=["auto", "cpu", "tpu"])
    args = parser.parse_args(argv)

    from tpumil.utils.platform import select_platform

    select_platform(args.device)

    from tpumil.data.mil_bench import DATASET_FILES, parse_mil_file
    from tpumil.train.schemes import MILBenchConfig, run_mil_cv

    if args.data_file:
        if args.num_feats is None:
            parser.error("--num_feats is required with --data_file")
        path, num_feats = args.data_file, args.num_feats
    else:
        if args.datasets not in DATASET_FILES:
            parser.error(f"unknown dataset {args.datasets}")
        rel, num_feats = DATASET_FILES[args.datasets]
        path = os.path.join("datasets", "mil_dataset", rel)
        if args.num_feats:
            num_feats = args.num_feats

    print("Dataset: " + (args.data_file or args.datasets))
    bags = parse_mil_file(path, num_feats=num_feats)
    cfg = MILBenchConfig(num_feats=num_feats, lr=args.lr, num_epochs=args.num_epoch,
                         cv_fold=args.cv_fold, weight_decay=args.weight_decay,
                         seed=args.seed, inst_shard=args.inst_shard)
    run_mil_cv(bags, cfg, model=args.model)
    return 0


if __name__ == "__main__":
    sys.exit(main())
