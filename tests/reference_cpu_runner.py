"""Run the mounted torch reference's train_tcga.py END-TO-END on CPU.

This is the strongest parity oracle available in this container: the
reference's own main() (train_tcga.py:199-433) drives generate_pt_files ->
per-fold train()/test() -> scheme aggregation, unmodified, on a shared
synthetic cohort — and tpumil's schemes run on the identical features and
folds (tests/test_reference_e2e.py).

Environment-compat shims only (no behavior changes):
  * CPU execution: the reference hardcodes .cuda()/torch.cuda.FloatTensor/
    map_location='cuda:0' (train_tcga.py:59-62,236-238); each is redirected
    to CPU equivalents.
  * scipy<1.11 mode semantics: train_tcga.py:402 ('mode_result.mode[0]')
    assumes the pre-1.11 keepdims=True default; installed scipy 1.17 would
    hand it a scalar and crash the standalone-test vote.

Usage (cwd must be the experiment workdir — temp_train/, weights/, test/
are created there):
    python reference_cpu_runner.py --dataset <name> --num_classes 1 ...
All argv pass straight through to train_tcga.main(). REF_SEED seeds
numpy's global RNG (sklearn.utils.shuffle) and torch's init RNG.
After main() returns, the temp_train glob order (the reference's bag/fold
order, train_tcga.py:253) is printed as one REF_GLOB_ORDER: json line so
the comparison can replicate its exact KFold membership.
"""

import glob
import json
import os
import sys
import types

sys.path.insert(0, os.environ.get("TPUMIL_REFERENCE", "/root/reference"))

# torchvision is not installed in this container; train_tcga.py imports it
# (train_tcga.py:5-6) but the precomputed-feature training path never calls
# into it — stub the module tree so the import succeeds.
if "torchvision" not in sys.modules:
    _tv = types.ModuleType("torchvision")
    _tvt = types.ModuleType("torchvision.transforms")
    _tvf = types.ModuleType("torchvision.transforms.functional")
    _tv.transforms = _tvt
    _tvt.functional = _tvf
    sys.modules["torchvision"] = _tv
    sys.modules["torchvision.transforms"] = _tvt
    sys.modules["torchvision.transforms.functional"] = _tvf

import numpy as np  # noqa: E402
import torch  # noqa: E402

_seed = int(os.environ.get("REF_SEED", "0"))
np.random.seed(_seed)
torch.manual_seed(_seed)

# ---- CPU shims ------------------------------------------------------------
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
torch.cuda.FloatTensor = torch.FloatTensor
torch.cuda.is_available = lambda: False
_load = torch.load


def _cpu_load(*a, **k):
    k["map_location"] = "cpu"
    return _load(*a, **k)


torch.load = _cpu_load

# ---- record the standalone-test bag shuffle --------------------------------
# train_tcga.py:352 shuffles the bag-path list (sklearn.utils.shuffle, global
# np RNG) to pick the reserved holdout; replaying tpumil's schemes on the
# identical split needs that order. Pure observation: the wrapper calls
# straight through (same RNG consumption) and records list-of-path results
# only — get_bag_feats' per-bag DataFrame row shuffles (train_tcga.py:24) and
# train()'s per-epoch path shuffles pass through unrecorded except the first
# list shuffle, which IS the standalone split (it precedes any train() call).
import sklearn.utils  # noqa: E402

_list_shuffles = []
_shuffle = sklearn.utils.shuffle


def _recording_shuffle(*arrays, **kw):
    out = _shuffle(*arrays, **kw)
    if (len(arrays) == 1 and isinstance(arrays[0], list)
            and arrays[0] and isinstance(arrays[0][0], str)):
        _list_shuffles.append(list(out))
    return out


sklearn.utils.shuffle = _recording_shuffle

# ---- scipy<1.11 mode semantics (train_tcga.py:402) -------------------------
import scipy.stats as _sstats  # noqa: E402

_mode = _sstats.mode


def _legacy_mode(a, axis=0, **k):
    k.setdefault("keepdims", True)
    return _mode(a, axis=axis, **k)


_sstats.mode = _legacy_mode

import train_tcga  # noqa: E402

sys.argv = ["train_tcga.py"] + sys.argv[1:]
train_tcga.main()
print("\nREF_GLOB_ORDER:" + json.dumps(glob.glob("temp_train/*.pt")))
if _list_shuffles:
    print("REF_SHUFFLE_ORDER:" + json.dumps(_list_shuffles[0]))
