"""End-to-end bag inference + attention heatmaps.

Replaces attention_map.py:59-118 and the hard-coded testing_tcga.py /
testing_c16.py variants: stream raw patches through the embedder (features +
instance logits accumulate on device), run the aggregator once on the full
bag, then render per-class attention onto the tile grid:

  * per detected class c (bag sigmoid >= thres[c]):
      colored += A[:, c] (x) color_c
  * benign bags produce an all-zero map. (The reference divides by
    num_pos_classes == 0 in the benign branch, attention_map.py:106, which
    NaNs the map under suppressed warnings; emitting zeros is the evident
    intent and what we do.)
  * rescale_intensity to [0, 1], scatter into a (max_row+1, max_col+1, 3)
    grid by the ``<a>_<b>`` filename positions, x32 nearest-neighbor upscale,
    save PNG; optional per-patch attention-score CSV with a 'pos' column
    (attention_map.py:114-118).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpumil.data import patches as patch_data
from tpumil.models import dsmil, embedder
from tpumil.models.embedder import EmbedderConfig
from tpumil.ops.image import img_as_ubyte, rescale_intensity, upscale_nearest


@dataclasses.dataclass
class BagResult:
    name: str
    scores: np.ndarray          # [C] sigmoid bag scores (after optional average)
    detected: List[int]         # classes over threshold
    attention: np.ndarray       # [N, C]
    positions: np.ndarray       # [N, 2]
    color_map: Optional[np.ndarray] = None  # [H*32, W*32, 3] float in [0,1]


class BagInference:
    """Embedder + aggregator over raw patch folders.

    ``mesh``: optional ``jax.sharding.Mesh`` — patch batches shard over
    EVERY mesh axis (embedder params replicated), the same scale-out as
    ``FeatureExtractor(mesh=...)``; heatmap generation is embedder-bound,
    so this lets one process drive a whole pod slice. ``batch_size`` must
    divide by the mesh's device count (the loader always yields full,
    zero-padded batches). The per-bag aggregator stays single-device — it
    is one tiny [N, K] forward per bag."""

    def __init__(self, emb_params: Dict, emb_cfg: EmbedderConfig,
                 agg_params: Dict, batch_size: int = 64,
                 patch_size: Optional[int] = 224, num_workers: int = 8,
                 model: str = "dsmil", mesh=None):
        from tpumil.models.registry import get_model

        mil = get_model(model)
        self.emb_params = emb_params
        self.emb_cfg = emb_cfg
        self.agg_params = agg_params
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.num_workers = num_workers
        self.model = model
        # embedder.forward normalizes uint8 batches on device itself
        if mesh is not None:
            from tpumil.parallel.mesh import make_batch_sharded_jit

            self._embed, put_params, _ = make_batch_sharded_jit(
                mesh, batch_size, lambda p, x: embedder.forward(p, x, emb_cfg))
            self.emb_params = put_params(emb_params)
        else:
            self._embed = jax.jit(lambda p, x: embedder.forward(p, x, emb_cfg))
        self._aggregate = jax.jit(
            lambda p, feats, c, mask: mil.forward(p, feats, mask, ins_logits=c))

    def run_bag(self, bag_dir: str, patch_ext: str = "jpg", average: bool = False,
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Returns (bag_scores [C], attention [N, C], ins_logits [N, C],
        positions [N, 2]) for one bag of raw patches."""
        paths = patch_data.list_patches(bag_dir, "single", exts=(patch_ext,))
        if not paths:
            raise FileNotFoundError(f"no *.{patch_ext} patches in {bag_dir}")
        positions = np.asarray([patch_data.parse_position(p) for p in paths])
        loader = patch_data.PatchBatchLoader(paths, self.batch_size,
                                             self.patch_size, self.num_workers,
                                             out_dtype=np.uint8)
        feats_parts, logits_parts = [], []
        for batch, n_valid, _ in loader:
            f, c = self._embed(self.emb_params, jnp.asarray(batch))
            feats_parts.append((f, n_valid))
            logits_parts.append((c, n_valid))
        feats = np.concatenate([np.asarray(f)[:n] for f, n in feats_parts])
        ins_logits = np.concatenate([np.asarray(c)[:n] for c, n in logits_parts])

        from tpumil.infer.common import pad_bag_to_bucket, testing_flow_average

        feats_p, logits_p, mask, n = pad_bag_to_bucket(feats, ins_logits)
        c, bag_logits, attn, _ = self._aggregate(
            self.agg_params, jnp.asarray(feats_p), jnp.asarray(logits_p),
            jnp.asarray(mask))
        scores = np.asarray(jax.nn.sigmoid(bag_logits))
        if average:
            scores = testing_flow_average(scores, ins_logits)
        return scores, np.asarray(attn)[:n], ins_logits, positions


def render_color_map(attention: np.ndarray, positions: np.ndarray,
                     detected: Sequence[int], colors: Sequence[np.ndarray],
                     upscale: int = 32) -> np.ndarray:
    """The grid render of attention_map.py:91-113. ``colors`` are RGB in
    [0, 255]; output is float [0, 1] at tile-grid x upscale resolution."""
    n = attention.shape[0]
    if detected:
        colored = np.zeros((n, 3), np.float64)
        for c in detected:
            colored += attention[:, c:c + 1] * np.asarray(colors[c], np.float64)[None, :]
        colored = colored / len(detected)
        colored = rescale_intensity(colored, (0.0, 1.0))
    else:
        colored = np.zeros((n, 3), np.float64)
    grid = np.zeros((positions[:, 0].max() + 1, positions[:, 1].max() + 1, 3))
    for k, pos in enumerate(positions):
        grid[pos[0], pos[1]] = colored[k]
    return upscale_nearest(grid, upscale)


def render_single_class_map(attention_c: np.ndarray, positions: np.ndarray,
                            color01: np.ndarray, upscale: int = 32,
                            ) -> np.ndarray:
    """The TESTING scripts' render (testing_tcga.py:102-108,
    testing_c16.py): the RAW attention column is rescaled to [0, 1] FIRST
    (min-subtraction included — the least-attended tile goes black) and
    then multiplied by a unit RGB color. This differs from
    attention_map.py's order (color first, rescale the colored product,
    which render_color_map reproduces): rescaling after coloring pins the
    global min to the zero channels, losing the min-subtraction.

    ``color01`` is RGB in [0, 1]; pass None/zeros for the reference's
    black benign/both maps (its else-branches leave color=[0,0,0] — and
    reuse the PREVIOUS slide's attention variable, an UnboundLocalError on
    the first slide; rendering black deliberately fixes that without
    changing any pixel the reference successfully writes)."""
    scaled = rescale_intensity(np.asarray(attention_c, np.float64), (0.0, 1.0))
    colored = scaled[:, None] * np.asarray(color01, np.float64)[None, :]
    grid = np.zeros((positions[:, 0].max() + 1, positions[:, 1].max() + 1, 3))
    for k, pos in enumerate(positions):
        grid[pos[0], pos[1]] = colored[k]
    return upscale_nearest(grid, upscale)


def save_png(image01: np.ndarray, path: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(img_as_ubyte(image01)).save(path)


def export_scores_csv(attention: np.ndarray, positions: np.ndarray, path: str) -> None:
    """Per-patch attention scores with a 'pos' column
    (attention_map.py:114-118)."""
    import pandas as pd

    df = pd.DataFrame(attention)
    df["pos"] = [str(p) for p in positions]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    df.to_csv(path, index=False)


def run_attention_maps(infer: BagInference, bags_list: Sequence[str],
                       thresholds: Sequence[float], class_names: Sequence[str],
                       map_path: str, colors: Optional[Sequence[np.ndarray]] = None,
                       patch_ext: str = "jpg", score_path: Optional[str] = None,
                       average: bool = False, seed: Optional[int] = None,
                       keep_maps: bool = False,
                       log: Callable[[str], None] = print) -> List[BagResult]:
    """The attention_map.py main loop: per bag, detect classes, render + save
    the heatmap, optionally export scores. Colors default to random RGB per
    class as the reference draws them (attention_map.py:63).

    ``keep_maps=False`` drops the rendered float64 map from the returned
    BagResults after saving: a 300x200-tile WSI's x32 map is ~1.4 GB, so
    retaining one per bag across a directory would OOM the host."""
    num_classes = len(thresholds)
    if colors is None:
        rng = np.random.default_rng(seed)
        colors = [rng.integers(0, 256, size=3) for _ in range(num_classes)]
    os.makedirs(map_path, exist_ok=True)
    results = []
    for bag_dir in bags_list:
        scores, attn, _, positions = infer.run_bag(bag_dir, patch_ext, average)
        scores = np.atleast_1d(np.squeeze(scores))
        detected = [c for c in range(num_classes) if scores[c] >= thresholds[c]]
        if detected:
            log(bag_dir + " is detected as: " +
                " and ".join(class_names[c] for c in detected))
        else:
            log(bag_dir + " is detected as: benign")
        cmap = render_color_map(attn, positions, detected, colors)
        slide_name = os.path.basename(bag_dir.rstrip(os.sep))
        save_png(cmap, os.path.join(map_path, slide_name + ".png"))
        if score_path:
            export_scores_csv(attn, positions,
                              os.path.join(score_path, slide_name + ".csv"))
        results.append(BagResult(slide_name, scores, detected, attn, positions,
                                 cmap if keep_maps else None))
    return results
