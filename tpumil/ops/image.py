"""Host-side image ops replacing the reference's skimage calls
(attention_map.py:107-113, testing_*.py): intensity rescaling, order-0
(nearest) integer upscaling, ubyte conversion, and HSV saturation. Pure
numpy — these run on tiny heatmap grids, not the accelerator."""

from __future__ import annotations

import numpy as np


def rescale_intensity(image: np.ndarray, out_range=(0.0, 1.0)) -> np.ndarray:
    """skimage.exposure.rescale_intensity semantics with in_range='image':
    linear map of [min, max] onto out_range; a constant image comes back
    as the constant clipped into out_range (skimage's exact else-branch:
    ``np.clip(image, omin, omax)``)."""
    image = np.asarray(image, dtype=np.float64)
    imin, imax = float(np.min(image)), float(np.max(image))
    omin, omax = float(out_range[0]), float(out_range[1])
    if imax == imin:
        return np.clip(image, omin, omax)
    scaled = (image - imin) / (imax - imin)
    return scaled * (omax - omin) + omin


def upscale_nearest(image: np.ndarray, factor: int) -> np.ndarray:
    """Order-0 resize by an integer factor (the reference's
    ``transform.resize(..., order=0)`` with a x32 target,
    attention_map.py:112)."""
    return np.repeat(np.repeat(image, factor, axis=0), factor, axis=1)


def img_as_ubyte(image: np.ndarray) -> np.ndarray:
    """Float [0,1] -> uint8 (skimage rounding)."""
    return np.clip(np.rint(np.asarray(image, np.float64) * 255.0), 0, 255).astype(np.uint8)


def rgb_to_saturation(image: np.ndarray) -> np.ndarray:
    """The S channel of HSV for an RGB uint8/float image, as used by the
    tissue filter (test_crop_single.py:17-24): S = (max - min) / max."""
    # (max-min)/max is scale invariant — no need to normalize uint8 inputs
    img = np.asarray(image, dtype=np.float64)
    mx = img.max(axis=-1)
    mn = img.min(axis=-1)
    sat = np.where(mx > 0, (mx - mn) / np.maximum(mx, 1e-12), 0.0)
    return sat


def mean_saturation_ubyte(image: np.ndarray) -> float:
    """Average of the ubyte-scaled saturation channel (test_crop_single.py:
    17-24: ``img_as_ubyte(sat)`` then mean)."""
    return float(np.mean(img_as_ubyte(rgb_to_saturation(image))))
