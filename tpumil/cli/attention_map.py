"""Attention heatmap CLI — mirror of the reference attention_map.py:121-175."""

from __future__ import annotations

import argparse
import glob
import os
import sys


def load_milnet(embedder_weights: str, aggregator_weights: str,
                num_classes: int, norm: str = "instance",
                backbone: str = "resnet18", precision: str = "f32",
                space_to_depth: bool = False):
    """Shared model assembly of the inference scripts: embedder via the
    popitem/positional surgery (attention_map.py:151-160), aggregator from a
    reference-schema (or tpumil-ABMIL) .pth, instance head overwritten from
    the aggregator's ``i_classifier.fc.0.*`` (attention_map.py:162-165).

    ``precision`` defaults to f32 to match compute_feats: the shipped
    reference thresholds (0.52827..., 0.45798/0.58273) were derived from
    f32 torch inference — bf16 embedding shifts sigmoid scores by O(1e-2)
    and flips verdicts near the threshold.

    Returns (emb_params, emb_cfg, agg_params, model_name)."""
    import jax

    from tpumil.io import torch_ckpt
    from tpumil.models import embedder
    from tpumil.models.embedder import EmbedderConfig

    agg_params, agg_cfg, model_name = torch_ckpt.load_mil_pth(aggregator_weights)
    if agg_cfg.num_classes != num_classes:
        raise ValueError(
            f"aggregator has {agg_cfg.num_classes} classes, expected "
            f"{num_classes} (check --num_classes / the checkpoint)")
    dtype, tier = embedder.precision_from_flag(precision)
    emb_cfg = EmbedderConfig(backbone=backbone, norm=norm,
                             num_classes=agg_cfg.num_classes,
                             space_to_depth=space_to_depth,
                             compute_dtype=dtype, precision=tier)
    if embedder_weights == "ImageNet":
        print("ImageNet embedder requested; supply a local .pth for real "
              "features (zero-egress environment). Using random init.")
        emb_params = embedder.init_params(jax.random.PRNGKey(0), emb_cfg)
    else:
        emb_params = embedder.load_simclr_checkpoint(embedder_weights, emb_cfg)
    emb_params = embedder.set_head(
        emb_params, agg_params["i_fc"]["w"], agg_params["i_fc"]["b"])
    return emb_params, emb_cfg, agg_params, model_name


DATA_PARALLEL_HELP = (
    "Shard each patch batch over the first N devices (embedder params "
    "replicated) — one process drives N chips; batch_size must divide by N. "
    "Same scale-out as compute_feats --data_parallel; the per-bag "
    "aggregator stays single-device.")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Attention computing and color map production (TPU-native)")
    parser.add_argument("--num_classes", type=int, default=2)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--feats_size", type=int, default=512)
    parser.add_argument("--thres", nargs="+", type=float, default=[0.7371, 0.2752])
    parser.add_argument("--class_name", nargs="+", type=str, default=None)
    parser.add_argument("--embedder_weights", type=str, default="test/weights/embedder.pth")
    parser.add_argument("--aggregator_weights", type=str, default="test/weights/aggregator.pth")
    parser.add_argument("--bag_path", type=str, default="test/patches")
    parser.add_argument("--patch_ext", type=str, default="jpg")
    parser.add_argument("--map_path", type=str, default="test/output")
    parser.add_argument("--export_scores", type=int, default=0)
    parser.add_argument("--score_path", type=str, default="test/score")
    parser.add_argument("--average", action="store_true")
    parser.add_argument("--seed", type=int, default=None,
                        help="Seed for the per-class heatmap colors (the "
                             "reference draws them unseeded, attention_map.py:63)")
    parser.add_argument("--backbone", type=str, default="resnet18")
    parser.add_argument("--precision", default="f32",
                        choices=["bf16", "f32", "f32h", "f32x"],
                        help="Embedding precision; f32 matches the "
                             "compute_feats default and the reference "
                             "thresholds (docs/PERF.md 'Precision tiers')")
    parser.add_argument("--space_to_depth",
                        action=argparse.BooleanOptionalAction, default=False,
                        help="Space-to-depth embedder stem (the benchmarked "
                             "fast config; feature parity to the plain stem "
                             "pinned at 1e-4). Default OFF so the shipped "
                             "reference thresholds stay exact, like serve.")
    parser.add_argument("--data_parallel", default=0, type=int, metavar="N",
                        help=DATA_PARALLEL_HELP)
    parser.add_argument("--device", default="auto", choices=["auto", "cpu", "tpu"])
    args = parser.parse_args(argv)

    from tpumil.utils.platform import select_platform

    select_platform(args.device)

    from tpumil.infer.heatmap import BagInference, run_attention_maps
    from tpumil.parallel.mesh import data_parallel_mesh

    if args.class_name is None:
        args.class_name = [f"class {c}" for c in range(args.num_classes)]
    if len(args.thres) != args.num_classes:
        raise ValueError("Number of thresholds does not match classes.")

    emb_params, emb_cfg, agg_params, model_name = load_milnet(
        args.embedder_weights, args.aggregator_weights, args.num_classes,
        backbone=args.backbone, precision=args.precision,
        space_to_depth=args.space_to_depth)
    mesh = data_parallel_mesh(args.data_parallel, what="embedding")
    infer = BagInference(emb_params, emb_cfg, agg_params,
                         batch_size=args.batch_size, num_workers=args.num_workers,
                         model=model_name, mesh=mesh)
    bags_list = sorted(glob.glob(os.path.join(args.bag_path, "*")))
    if args.export_scores:
        os.makedirs(args.score_path, exist_ok=True)
    run_attention_maps(infer, bags_list, args.thres, args.class_name,
                       args.map_path, patch_ext=args.patch_ext,
                       score_path=args.score_path if args.export_scores else None,
                       average=args.average, seed=args.seed)
    return 0


if __name__ == "__main__":
    sys.exit(main())
