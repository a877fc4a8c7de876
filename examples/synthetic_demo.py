"""End-to-end tpumil demo on self-generated synthetic slides.

Runs the whole five-stage pipeline without any downloads:
  1. generate 6 pyramidal TIFF "slides" (textured tissue on white background,
     two classes);
  2. tile them into patch folders;
  3. SimCLR-pretrain the embedder for a couple of epochs;
  4. extract per-bag features;
  5. train the DSMIL aggregator with 5-fold CV;
  6. render attention heatmaps.

Usage:  python examples/synthetic_demo.py [workdir]
(CPU-friendly; ~5 minutes. On TPU drop --device cpu below.)
"""

from __future__ import annotations

import os
import sys

import numpy as np

# runnable as `python examples/synthetic_demo.py` without installing tpumil
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def make_slides(root: str, rng) -> None:
    from PIL import Image

    for cls, maker in (
        ("tumor", lambda n: (rng.random((640, 640, 3)) * 180 + 20).astype(np.uint8)),
        ("normal", lambda n: np.clip(
            (rng.random((640, 640, 3)) * 60 + 120) + [0, 40, 0], 0, 255
        ).astype(np.uint8)),
    ):
        for i in range(3):
            img = np.full((1024, 1024, 3), 255, np.uint8)
            img[:640, :640] = maker(i)
            pages = [Image.fromarray(img)]
            pages.append(pages[-1].resize((512, 512)))
            d = os.path.join(root, "WSI", "demo", cls)
            os.makedirs(d, exist_ok=True)
            pages[0].save(os.path.join(d, f"{cls}{i}.tif"), save_all=True,
                          append_images=pages[1:], description="|AppMag = 20|")


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "demo_run"
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    rng = np.random.default_rng(0)
    print("== generating synthetic slides")
    make_slides(".", rng)

    from tpumil.cli import compute_feats, simclr_train, tiler, train_wsi
    from tpumil.cli.attention_map import main as attention_map_main

    print("== tiling")
    tiler.main(["-d", "demo", "-v", "tif", "-s", "128", "-m", "0"])
    print("== simclr pretraining")
    simclr_train.main(["--dataset", "demo", "--wsi_root", "WSI",
                       "--batch_size", "16", "--epochs", "2",
                       "--input_size", "128", "--lr", "1e-4",
                       "--run_dir", "runs/demo"])
    print("== feature extraction")
    compute_feats.main(["--dataset", "demo", "--num_classes", "1",
                        "--batch_size", "16", "--patch_size", "128",
                        "--weights", "runs/demo/checkpoints/model.pth"])
    print("== aggregator training (5-fold CV)")
    train_wsi.main(["--dataset", "demo", "--num_classes", "1",
                    "--feats_size", "512", "--num_epochs", "8",
                    "--stop_epochs", "4", "--lr", "0.002",
                    "--eval_scheme", "5-fold-cv"])
    print("== attention heatmaps")
    import datetime
    import glob

    weights = sorted(glob.glob(os.path.join(
        "weights", datetime.date.today().strftime("%Y%m%d"), "fold_*.pth")))
    attention_map_main(["--num_classes", "1", "--thres", "0.5",
                        "--embedder_weights", "runs/demo/checkpoints/model.pth",
                        "--aggregator_weights", weights[0],
                        "--bag_path", "WSI/demo/single/tumor",
                        "--patch_ext", "jpeg", "--map_path", "maps",
                        "--batch_size", "16"])
    print(f"\ndone — heatmaps in {os.path.abspath('maps')}")


if __name__ == "__main__":
    main()
