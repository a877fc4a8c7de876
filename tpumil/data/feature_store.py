"""Precomputed bag-feature store.

Filesystem contracts (the reference's real API, README.md:286-313):
  * per-bag CSV: one row per instance, K feature columns with a header row
    (written with float_format='%.4f', compute_feats.py:80-82);
  * master dataset CSV ``datasets/<ds>/<ds>.csv``: column 0 = bag CSV path,
    column 'label' = integer class (compute_feats.py:249-260);
  * the reference caches each bag as a ``.pt`` tensor for a "10x speedup"
    (README.md:5, train_tcga.py:36-51). Here bags are cached as ``.npz``
    (feats float32 [N, K] + label [C]) — same role, no torch dependency —
    with the reference's row shuffle applied once at cache time
    (train_tcga.py:25).
"""

from __future__ import annotations

import os
import shutil
from typing import List, Optional, Sequence, Tuple

import numpy as np

from tpumil.data.bags import Bag


def read_master_csv(path: str) -> List[Tuple[str, int]]:
    """Read the master bag list ``<ds>.csv`` -> [(bag_csv_path, label)]."""
    import pandas as pd

    df = pd.read_csv(path)
    return [(str(row.iloc[0]), int(row.iloc[1])) for _, row in df.iterrows()]


def encode_label(raw_label: int, num_classes: int) -> np.ndarray:
    """Reference label encoding (train_tcga.py:27-32): binary tasks store the
    raw value in slot 0; multi-class tasks one-hot iff the index is in range."""
    label = np.zeros(num_classes, dtype=np.float32)
    if num_classes == 1:
        label[0] = float(raw_label)
    elif int(raw_label) <= num_classes - 1:
        label[int(raw_label)] = 1.0
    return label


def read_bag_csv(path: str, shuffle_rows: bool = False,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Read one per-bag feature CSV (header row, K float columns)."""
    import pandas as pd

    feats = pd.read_csv(path).to_numpy(dtype=np.float32)
    if shuffle_rows:
        rng = rng or np.random.default_rng()
        feats = feats[rng.permutation(feats.shape[0])]
    return feats


def resolve_bag_path(entry_path: str, dataset: str) -> str:
    """The hidden coupling of ``--dataset TCGA-lung-default``
    (train_tcga.py:20-21): remap the listed path into the downloaded
    tcga_lung_data_feats folder."""
    if dataset == "TCGA-lung-default":
        name = entry_path.split("/")[1]
        return os.path.join("datasets", "tcga-dataset", "tcga_lung_data_feats", name + ".csv")
    return entry_path


class BagCache:
    """Cache bag CSVs as npz files and serve them as Bag objects.

    Mirrors generate_pt_files (train_tcga.py:36-51): the cache directory is
    wiped and rebuilt from the master CSV; each bag's rows are shuffled once
    at cache-build time.
    """

    def __init__(self, cache_dir: str = "temp_train"):
        self.cache_dir = cache_dir

    def build(self, entries: Sequence[Tuple[str, int]], num_classes: int,
              dataset: str = "", seed: int = 0,
              log=lambda s: None) -> List[str]:
        if os.path.exists(self.cache_dir):
            shutil.rmtree(self.cache_dir, ignore_errors=True)
        os.makedirs(self.cache_dir, exist_ok=True)
        rng = np.random.default_rng(seed)
        paths = []
        seen = {}
        for i, (entry_path, raw_label) in enumerate(entries):
            csv_path = resolve_bag_path(entry_path, dataset)
            feats = read_bag_csv(csv_path, shuffle_rows=True, rng=rng)
            label = encode_label(raw_label, num_classes)
            name = os.path.splitext(os.path.basename(csv_path))[0]
            # The reference keys cache files by basename alone
            # (train_tcga.py:50), so class0/x.csv and class1/x.csv silently
            # overwrite each other — one bag trains twice under the wrong
            # label, the other vanishes. Disambiguate instead of corrupting.
            if seen.get(name, csv_path) != csv_path:
                parent = os.path.basename(os.path.dirname(csv_path))
                name = f"{parent}_{name}" if parent else name
                while seen.get(name, csv_path) != csv_path:
                    name = f"{name}_{i}"
            seen.setdefault(name, csv_path)
            out = os.path.join(self.cache_dir, name + ".npz")
            np.savez_compressed(out, feats=feats, label=label)
            paths.append(out)
            log(f"\r Caching bag [{i + 1}/{len(entries)}]")
        log("\n")
        return paths

    @staticmethod
    def load(path: str) -> Bag:
        data = np.load(path)
        name = os.path.splitext(os.path.basename(path))[0]
        return Bag(feats=np.asarray(data["feats"], np.float32),
                   label=np.asarray(data["label"], np.float32), name=name)

    def load_all(self, paths: Optional[Sequence[str]] = None) -> List[Bag]:
        import glob

        if paths is None:
            paths = sorted(glob.glob(os.path.join(self.cache_dir, "*.npz")))
        return [self.load(p) for p in paths]


def write_bag_csv(feats: np.ndarray, path: str) -> None:
    """Write a per-bag feature CSV with the reference's exact format: integer
    column header 0..K-1, '%.4f' floats (compute_feats.py:80-82)."""
    import pandas as pd

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pd.DataFrame(np.asarray(feats)).to_csv(path, index=False, float_format="%.4f")


def build_dataset_csvs(feats_root: str, dataset: str, out_dir: Optional[str] = None,
                       rng: Optional[np.random.Generator] = None) -> str:
    """Assemble per-class bag lists and the shuffled master CSV from a
    directory of per-class bag CSVs (compute_feats.py:249-260). Classes are
    the sorted subdirectories of ``feats_root``; labels are their sorted
    order. Returns the master CSV path."""
    import glob

    import pandas as pd

    out_dir = out_dir or feats_root
    class_dirs = sorted(d for d in glob.glob(os.path.join(feats_root, "*"))
                        if os.path.isdir(d))
    all_dfs = []
    for i, class_dir in enumerate(class_dirs):
        bag_csvs = sorted(c for c in glob.glob(os.path.join(class_dir, "*.csv"))
                          if not c.endswith(".pos.csv"))  # position sidecars
        df = pd.DataFrame(bag_csvs)
        df["label"] = i
        df.to_csv(os.path.join(out_dir, os.path.basename(class_dir) + ".csv"),
                  index=False)
        all_dfs.append(df)
    master = pd.concat(all_dfs, axis=0, ignore_index=True)
    rng = rng or np.random.default_rng()
    master = master.iloc[rng.permutation(len(master))].reset_index(drop=True)
    master_path = os.path.join(out_dir, dataset + ".csv")
    master.to_csv(master_path, index=False)
    return master_path
