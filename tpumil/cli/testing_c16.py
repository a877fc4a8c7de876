"""Camelyon16 demo tester — mirror of testing_c16.py: 1-class tumor detection
with fixed threshold 0.52827 and red attention maps (testing_c16.py:110)."""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Camelyon16 testing: attention computing and color map production")
    parser.add_argument("--num_classes", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--feats_size", type=int, default=512)
    parser.add_argument("--thres_tumor", type=float, default=0.5282700061798096)
    parser.add_argument("--average", action="store_true")
    parser.add_argument("--aggregator_weights", type=str,
                        default="example_aggregator_weights/c16_aggregator.pth")
    parser.add_argument("--embedder_weights", type=str,
                        default=os.path.join("test-c16", "weights", "embedder.pth"))
    parser.add_argument("--bag_path", type=str, default=os.path.join("test-c16", "patches"))
    parser.add_argument("--output", type=str, default=os.path.join("test-c16", "output"))
    parser.add_argument("--device", default="auto", choices=["auto", "cpu", "tpu"])
    from tpumil.cli.attention_map import DATA_PARALLEL_HELP

    parser.add_argument("--data_parallel", default=0, type=int, metavar="N",
                        help=DATA_PARALLEL_HELP)
    args = parser.parse_args(argv)

    from tpumil.utils.platform import select_platform

    select_platform(args.device)

    from tpumil.cli.attention_map import load_milnet
    from tpumil.infer.heatmap import (BagInference, render_single_class_map,
                                      save_png)
    from tpumil.parallel.mesh import data_parallel_mesh

    emb_params, emb_cfg, agg_params, model_name = load_milnet(
        args.embedder_weights, args.aggregator_weights, args.num_classes)
    infer = BagInference(emb_params, emb_cfg, agg_params,
                         batch_size=args.batch_size,
                         num_workers=args.num_workers, model=model_name,
                         mesh=data_parallel_mesh(args.data_parallel,
                                                 what="embedding"))

    red = np.asarray([1.0, 0.0, 0.0])  # unit RGB (testing_c16 semantics:
    # raw attention rescaled first, then scaled by the color)
    bags_list = sorted(glob.glob(os.path.join(args.bag_path, "*")))
    os.makedirs(args.output, exist_ok=True)
    for bag_dir in bags_list:
        scores, attn, _, positions = infer.run_bag(bag_dir, "jpg", args.average)
        tumor = float(np.squeeze(scores)) >= args.thres_tumor
        # exact reference verdict strings (testing_c16.py:87,92 — note: no
        # colon, "malignant"/"benign")
        print(bag_dir + " is detected as "
              + ("malignant" if tumor else "benign"))
        cmap = render_single_class_map(
            attn[:, 0] if tumor else np.zeros(attn.shape[0]),
            positions, red if tumor else np.zeros(3))
        save_png(cmap, os.path.join(args.output,
                                    os.path.basename(bag_dir.rstrip(os.sep)) + ".png"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
