"""One-pass slide -> features CLI: tiling and embedding fused, no JPEG
round-trip (tpumil extension beyond the reference's two-stage pipeline;
SURVEY.md section 7 step 5)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Stream slides straight into per-bag feature CSVs")
    parser.add_argument("--dataset", required=True, type=str)
    parser.add_argument("--wsi_root", default="WSI", type=str)
    parser.add_argument("--out_root", default="datasets", type=str)
    parser.add_argument("--slide_format", default="svs", type=str)
    parser.add_argument("--num_classes", default=1, type=int)
    parser.add_argument("--backbone", default="resnet18", type=str)
    parser.add_argument("--norm_layer", default="instance", type=str)
    parser.add_argument("--weights", default=None, type=str,
                        help="SimCLR run folder or explicit .pth path")
    parser.add_argument("--tile_size", default=224, type=int)
    parser.add_argument("--base_mag", default=20, type=float)
    parser.add_argument("--objective", default=20, type=float)
    parser.add_argument("--background_t", default=15, type=float)
    parser.add_argument("--magnifications", type=int, nargs="+", default=(0,))
    # 128 is the measured sweet spot (docs/PERF.md batch sweep: 30.7k
    # patches/s at 128 vs 19.0k at 64)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--workers", default=4, type=int)
    parser.add_argument("--space_to_depth", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="2x2 space-to-depth stem rewrite (identical "
                             "features to 1e-4, benchmarked rate); "
                             "--no-space_to_depth restores the 7x7/s2 stem")
    parser.add_argument("--data_parallel", default=0, type=int, metavar="N",
                        help="Shard each patch batch over the first N "
                             "devices; batch_size must divide by N")
    # f32 default, matching compute_feats and the measured policy (bf16
    # features shift downstream AUC — docs/PERF.md "Precision tiers");
    # bf16 stays the explicit throughput opt-in
    parser.add_argument("--precision", default="f32",
                        choices=["bf16", "f32", "f32h", "f32x"])
    parser.add_argument("--shard", type=str, default=None,
                        help="'i/n': process only every n-th slide starting "
                             "at i (multi-host scale-out; assemble the "
                             "dataset CSVs after all shards finish)")
    parser.add_argument("--device", default="auto", choices=["auto", "cpu", "tpu"])
    args = parser.parse_args(argv)

    from tpumil.utils.platform import select_platform

    select_platform(args.device)

    import glob
    import os

    import jax
    from tpumil.data.tiler import TilerConfig
    from tpumil.infer.features import FeatureExtractor
    from tpumil.infer.stream_embed import embed_dataset_streaming
    from tpumil.models import embedder
    from tpumil.models.embedder import EmbedderConfig

    dtype, tier = embedder.precision_from_flag(args.precision)
    cfg = EmbedderConfig(backbone=args.backbone, norm=args.norm_layer,
                         num_classes=args.num_classes,
                         space_to_depth=args.space_to_depth,
                         compute_dtype=dtype, precision=tier)
    if args.weights and os.path.exists(args.weights):
        params = embedder.load_simclr_checkpoint(args.weights, cfg)
    elif args.weights:
        path = os.path.join("simclr", "runs", args.weights, "checkpoints", "model.pth")
        params = embedder.load_simclr_checkpoint(path, cfg)
    else:
        cands = sorted(glob.glob("simclr/runs/*/checkpoints/*.pth"))
        if cands:
            params = embedder.load_simclr_checkpoint(cands[-1], cfg)
        else:
            print("no SimCLR weights found; using random init")
            params = embedder.init_params(jax.random.PRNGKey(0), cfg)

    from tpumil.parallel.mesh import data_parallel_mesh

    mesh = data_parallel_mesh(args.data_parallel)
    extractor = FeatureExtractor(params, cfg, args.batch_size, args.tile_size,
                                 mesh=mesh)
    tiler_cfg = TilerConfig(tile_size=args.tile_size, base_mag=args.base_mag,
                            objective=args.objective,
                            background_threshold=args.background_t,
                            workers=args.workers)
    from tpumil.utils.sharding import parse_shard

    master = embed_dataset_streaming(
        args.wsi_root, args.dataset, extractor, args.out_root, tiler_cfg,
        args.slide_format, tuple(args.magnifications),
        batch_size=args.batch_size, shard=parse_shard(args.shard))
    if master:
        print(f"master CSV: {master}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
