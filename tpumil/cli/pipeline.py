"""Single-config pipeline driver: run any subset of the five stages from one
typed YAML (tpumil.io.config.PipelineConfig) — the cohesive alternative to
the reference's five separate scripts sharing state via the filesystem.

    python -m tpumil.cli.pipeline --config exp.yaml \
        --stages tile,simclr,feats,train,maps
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

STAGES = ("tile", "simclr", "feats", "train", "maps")


def main(argv=None):
    parser = argparse.ArgumentParser(description="tpumil pipeline driver")
    parser.add_argument("--config", required=True, help="PipelineConfig YAML")
    parser.add_argument("--stages", default="tile,simclr,feats,train",
                        help=f"comma-separated subset of {STAGES}")
    parser.add_argument("--device", default="auto", choices=["auto", "cpu", "tpu"])
    parser.add_argument("--run_root", default="runs")
    args = parser.parse_args(argv)

    from tpumil.utils.platform import select_platform

    select_platform(args.device)

    from tpumil.io.config import PipelineConfig

    cfg = PipelineConfig.from_yaml(args.config)
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    for s in stages:
        if s not in STAGES:
            parser.error(f"unknown stage {s!r}; valid: {STAGES}")
    # Validate every cross-stage sharding constraint UP FRONT: the train and
    # maps stages run last, after potentially hours of tiling/pretraining —
    # a divisibility or too-few-devices error there would discard the run.
    dp = cfg.embedder.data_parallel
    if dp:
        if dp < 0:
            parser.error(f"embedder.data_parallel must be >= 0, got {dp}")
        if "feats" in stages and cfg.embedder.batch_size % dp:
            parser.error(
                f"embedder.batch_size {cfg.embedder.batch_size} must divide "
                f"by embedder.data_parallel {dp} (feats stage)")
        if "maps" in stages and cfg.inference.batch_size % dp:
            parser.error(
                f"inference.batch_size {cfg.inference.batch_size} must divide "
                f"by embedder.data_parallel {dp} (maps stage shards patch "
                f"batches over the same mesh as feats)")
    device_asks = []
    if dp and ("feats" in stages or "maps" in stages):
        device_asks.append(("embedder.data_parallel", dp))
    if "train" in stages:
        if cfg.train.inst_shard and cfg.train.data_parallel:
            parser.error("train.inst_shard and train.data_parallel are "
                         "mutually exclusive (per-bag vs minibatch "
                         "optimization)")
        for name, val in (("train.inst_shard", cfg.train.inst_shard),
                          ("train.data_parallel", cfg.train.data_parallel)):
            if val < 0:
                parser.error(f"{name} must be >= 0, got {val}")
            if val:
                device_asks.append((name, val))
    if device_asks:
        # platform is already selected: a cheap probe now beats a crash in
        # the stage that finally builds the mesh
        from tpumil.parallel.mesh import take_devices

        for name, val in device_asks:
            try:
                take_devices(val)
            except ValueError as exc:
                parser.error(f"{name}: {exc}")

    run_dir = os.path.join(args.run_root, cfg.dataset)
    os.makedirs(run_dir, exist_ok=True)
    cfg.to_yaml(os.path.join(run_dir, "resolved_config.yaml"))

    simclr_ckpt = None
    if "tile" in stages:
        from tpumil.data.tiler import tile_dataset

        print(f"== stage: tile ({cfg.dataset}, mags {cfg.magnifications})")
        tile_dataset(cfg.wsi_root, cfg.dataset, cfg.magnifications, cfg.tiler,
                     slide_format="svs")
        # also pick up .tif slides like the reference's glob patterns
        tile_dataset(cfg.wsi_root, cfg.dataset, cfg.magnifications, cfg.tiler,
                     slide_format="tif")

    if "simclr" in stages:
        from tpumil.cli.simclr_train import generate_manifest
        from tpumil.models.simclr import SimCLRConfig
        from tpumil.train.simclr_trainer import SimCLRTrainer

        print("== stage: simclr")
        multiscale = 1 if len(cfg.magnifications) > 1 else 0
        # level is only consulted for multiscale manifests (simclr/run.py:8-19)
        paths = generate_manifest(cfg.wsi_root, cfg.dataset, "low", multiscale)
        if not paths:
            raise SystemExit("no patches found; run the tile stage first")
        if cfg.embedder.backbone not in ("resnet18", "resnet50"):
            raise SystemExit(
                f"SimCLR pretraining supports resnet18/resnet50 (the reference "
                f"too, simclr/models/resnet_simclr.py:10-11); configured "
                f"embedder.backbone={cfg.embedder.backbone!r} would not load "
                f"back positionally. Set embedder.weights to pretrain elsewhere.")
        model_cfg = SimCLRConfig(base_model=cfg.embedder.backbone)
        trainer = SimCLRTrainer(model_cfg, cfg.simclr)
        out = trainer.fit(paths, os.path.join(run_dir, "simclr"))
        simclr_ckpt = out["checkpoint"]

    if "feats" in stages:
        print("== stage: feats")
        weights = cfg.embedder.weights or simclr_ckpt
        if weights is None:
            cands = sorted(glob.glob(os.path.join(run_dir, "simclr",
                                                  "checkpoints", "*.pth")))
            weights = cands[-1] if cands else None
        if weights is None:
            raise SystemExit("no embedder weights; run the simclr stage or "
                             "set embedder.weights")
        from tpumil.cli import compute_feats as cf

        cf_args = ["--dataset", cfg.dataset, "--num_classes",
                   str(cfg.embedder.num_classes), "--batch_size",
                   str(cfg.embedder.batch_size), "--num_workers",
                   str(cfg.embedder.num_workers), "--backbone",
                   cfg.embedder.backbone, "--norm_layer", cfg.embedder.norm_layer,
                   "--magnification", cfg.embedder.magnification,
                   "--weights", weights, "--wsi_root", cfg.wsi_root,
                   "--out_root", cfg.datasets_root, "--patch_size",
                   str(cfg.embedder.patch_size), "--precision",
                   cfg.embedder.precision, "--tree_fusion",
                   cfg.embedder.tree_fusion]
        if not cfg.embedder.space_to_depth:
            cf_args += ["--no-space_to_depth"]
        if cfg.embedder.data_parallel:
            cf_args += ["--data_parallel", str(cfg.embedder.data_parallel)]
        if cfg.embedder.weights_high:
            cf_args += ["--weights_high", cfg.embedder.weights_high]
        if cfg.embedder.weights_low:
            cf_args += ["--weights_low", cfg.embedder.weights_low]
        cf.main(cf_args)

    if "train" in stages:
        print(f"== stage: train ({cfg.train.model}, "
              f"{getattr(cfg.train, 'num_epochs', '?')} epochs)")
        from tpumil.data.feature_store import BagCache, read_master_csv
        from tpumil.train import schemes

        bags_csv = os.path.join(cfg.datasets_root, cfg.dataset, cfg.dataset + ".csv")
        cache = BagCache(os.path.join(run_dir, "bag_cache"))
        cache.build(read_master_csv(bags_csv), cfg.train.num_classes,
                    dataset=cfg.dataset, seed=cfg.train.seed)
        bags = cache.load_all()
        save_dir = os.path.join(run_dir, "weights")
        schemes.run_5fold_cv_standalone_test(bags, cfg.train, save_dir=save_dir)

    if "maps" in stages:
        print("== stage: maps")
        from tpumil.cli.attention_map import load_milnet
        from tpumil.infer.heatmap import BagInference, run_attention_maps
        from tpumil.parallel.mesh import data_parallel_mesh

        agg = sorted(glob.glob(os.path.join(run_dir, "weights", "fold_*.pth")))
        if not agg:
            raise SystemExit("no trained aggregator; run the train stage first")
        emb = cfg.embedder.weights or simclr_ckpt
        if emb is None:
            cands = sorted(glob.glob(os.path.join(run_dir, "simclr",
                                                  "checkpoints", "*.pth")))
            if not cands:
                raise SystemExit("no embedder weights; run the simclr stage "
                                 "or set embedder.weights")
            emb = cands[-1]
        emb_params, emb_cfg, agg_params, model_name = load_milnet(
            emb, agg[0], cfg.train.num_classes, cfg.embedder.norm_layer,
            backbone=cfg.embedder.backbone,
            precision=cfg.embedder.precision,
            # the SAME stem the feats stage embedded (and the aggregator
            # trained on) — an s2d/plain mismatch costs up to 1e-4 feature
            # drift between the stages of one run
            space_to_depth=cfg.embedder.space_to_depth)
        infer = BagInference(emb_params, emb_cfg, agg_params,
                             batch_size=cfg.inference.batch_size,
                             patch_size=cfg.embedder.patch_size,
                             num_workers=cfg.inference.num_workers,
                             model=model_name,
                             # same scale-out as the feats stage above
                             mesh=data_parallel_mesh(cfg.embedder.data_parallel,
                                                     what="embedding"))
        layout = "pyramid" if len(cfg.magnifications) > 1 else "single"
        bags_list = sorted(glob.glob(os.path.join(cfg.wsi_root, cfg.dataset,
                                                  layout, "*", "*")))
        thres = cfg.inference.thresholds or [0.5] * cfg.train.num_classes
        names = cfg.inference.class_names or [f"class {c}"
                                              for c in range(cfg.train.num_classes)]
        run_attention_maps(
            infer, bags_list, thres, names, os.path.join(run_dir, "maps"),
            # tiles were written by the tiler stage in cfg.tiler.format
            patch_ext=cfg.inference.patch_ext or cfg.tiler.format,
            score_path=os.path.join(run_dir, "scores")
            if cfg.inference.export_scores else None,
            average=cfg.inference.average, seed=cfg.train.seed)
    print("pipeline done.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
