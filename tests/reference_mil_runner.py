"""Run the mounted torch reference's train_mil.py END-TO-END on CPU.

Drives the reference's own main() (train_mil.py:114-188) — svm parse,
bag-list shuffle + class-coverage loop, 10-fold chunked CV, per-bag Adam
with pos_weight'd BCE, best-epoch accuracy — on the vendored musk1-format
fixture, so tpumil's run_mil_cv can be compared on IDENTICAL fold
membership (tests/test_reference_e2e.py).

Environment-compat shims only (no behavior changes):
  * torchvision stub + CPU .cuda() redirects as in reference_cpu_runner.py.
  * The fixture's bag ids are 1-based; the reference's
    ``for i in range(num_bag)`` (train_mil.py:144-149) requires 0-based
    contiguous ids (the real musk1norm.svm is 0-based), so the runner
    writes a 0-shifted copy of the fixture into the layout main() expects
    (datasets/mil_dataset/Musk/musk1norm.svm). Pure data relocation.
  * sklearn.utils.shuffle is wrapped (pure observation, calls through) to
    record the BAG-LIST shuffles (elements are [label, vectors] pairs —
    the per-bag instance shuffles inside epoch_train don't match the
    filter); the LAST recorded one is the fold order actually trained on,
    printed as content signatures (label, n_instances, first feature) so
    the comparison can map it back to fixture indices.
"""

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.environ.get("TPUMIL_REFERENCE", "/root/reference"))

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

_pre = argparse.ArgumentParser(add_help=False)
_pre.add_argument("--src", required=True,
                  help="musk1-format fixture (1-based bag ids ok)")
_args, _rest = _pre.parse_known_args()

_seed = int(os.environ.get("REF_SEED", "0"))
np.random.seed(_seed)
torch.manual_seed(_seed)

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
torch.cuda.FloatTensor = torch.FloatTensor
torch.cuda.is_available = lambda: False

# ---- 0-shift the fixture into the reference's expected layout -------------
os.makedirs("datasets/mil_dataset/Musk", exist_ok=True)
with open(_args.src) as f:
    lines = f.read().splitlines()
body = [ln for ln in lines[1:] if ln.strip()]
ids = [int(ln.split(" ")[0].split(":")[1]) for ln in body]
shift = min(ids)
with open("datasets/mil_dataset/Musk/musk1norm.svm", "w") as f:
    f.write(lines[0] + "\n")
    for ln in body:
        head, rest = ln.split(" ", 1)
        a, b, c = head.split(":")
        f.write(f"{a}:{int(b) - shift}:{c} {rest}\n")

# ---- record the bag-list shuffles -----------------------------------------
import sklearn.utils  # noqa: E402

_bag_orders = []
_shuffle = sklearn.utils.shuffle


def _sig(item):
    label, vecs = item[0], item[1]
    return [float(label), len(vecs), round(float(vecs[0][0]), 6)]


def _recording_shuffle(*arrays, **kw):
    out = _shuffle(*arrays, **kw)
    if (len(arrays) == 1 and isinstance(arrays[0], list) and arrays[0]
            and isinstance(arrays[0][0], list) and len(arrays[0][0]) == 2):
        _bag_orders.append([_sig(it) for it in out])
    return out


sklearn.utils.shuffle = _recording_shuffle

import train_mil  # noqa: E402

sys.argv = ["train_mil.py"] + _rest
train_mil.main()
print("\nREF_MIL_ORDER:" + json.dumps(_bag_orders[-1]))
