"""Simple fixed-grid cropper for demo/test slides — mirror of
test_crop_single.py: reads level-1 regions on a step grid, keeps patches by
HSV-saturation, saves ``<row>_<col>.jpg`` plus a thumbnail.

Reference quirks reproduced deliberately (SURVEY.md section 7):
  * the level-0/level-1 downsample factor is hard-coded to 4
    (test_crop_single.py:27) — we instead use the slide's true downsample
    for the level actually read (1.0 when a single-level slide reads
    level 0: read_region locations are level-0 coordinates);
  * saturation threshold 30 (test_crop_single.py:29) although the helper
    documents 15.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def crop_slide_grid(slide_path: str, out_dir: str, thumb_dir: str,
                    step: int = 224, patch_size: int = 224,
                    sat_threshold: float = 30.0, thumb_divisor: int = 7,
                    log=print) -> int:
    from PIL import Image

    from tpumil.data.slide import open_slide
    from tpumil.ops.image import img_as_ubyte, mean_saturation_ubyte

    slide = open_slide(slide_path)
    try:
        level = 1 if slide.level_count > 1 else 0
        factor = slide.level_downsample(level)  # 1.0 when reading level 0
        w, h = slide.level_dimensions[level]
        name = os.path.splitext(os.path.basename(slide_path))[0]
        bag = os.path.join(out_dir, name)
        os.makedirs(bag, exist_ok=True)
        os.makedirs(thumb_dir, exist_ok=True)
        # thumbnail at 1/thumb_divisor of the level-1 dims
        # (test_crop_single.py:45-47). Read the SMALLEST pyramid level that
        # still covers the target instead of the full level being cropped
        # (a 25k^2 level-1 read would be ~1.9 GB for a ~3.5k thumbnail).
        tw, th = max(1, int(w / thumb_divisor)), max(1, int(h / thumb_divisor))
        tlvl = level
        for cand in range(slide.level_count - 1, level - 1, -1):
            if slide.level_dimensions[cand][0] >= tw:
                tlvl = cand
                break
        cw, ch = slide.level_dimensions[tlvl]
        thumb = slide.read_region((0, 0), tlvl, (cw, ch))
        Image.fromarray(thumb).resize((tw, th)).save(
            os.path.join(thumb_dir, name + ".png"))
        kept = 0
        for j in range(h // step):           # rows
            for i in range(w // step):       # columns
                region = slide.read_region(
                    (int(i * step * factor), int(j * step * factor)),
                    level, (patch_size, patch_size))
                if mean_saturation_ubyte(region) >= sat_threshold:
                    Image.fromarray(region).save(
                        os.path.join(bag, f"{j}_{i}.jpg"))
                    kept += 1
            log(f"\r Cropped rows: {j + 1}/{h // step}")
        log("")
        return kept
    finally:
        slide.close()


def main(argv=None):
    parser = argparse.ArgumentParser(description="Generate patches from testing slides")
    parser.add_argument("--dataset", type=str, default="tcga", help="tcga|c16")
    parser.add_argument("--overlap", type=int, default=0)
    parser.add_argument("--patch_size", type=int, default=224)
    args = parser.parse_args(argv)

    base = "test" if args.dataset == "tcga" else "test-c16"
    path_base = os.path.join(base, "input")
    out_base = os.path.join(base, "patches")
    thumb_dir = os.path.join(base, "thumbnails")
    slides = (glob.glob(os.path.join(path_base, "*.svs"))
              + glob.glob(os.path.join(path_base, "*.tif")))
    print("Cropping patches, please be patient")
    step = args.patch_size - args.overlap
    # test (tcga) thumbnails at 1/7, c16 at 1/28 (test_crop_single.py:45-47)
    divisor = 7 if args.dataset == "tcga" else 28
    for s in slides:
        crop_slide_grid(s, out_base, thumb_dir, step, args.patch_size,
                        thumb_divisor=divisor)
    return 0


if __name__ == "__main__":
    sys.exit(main())
