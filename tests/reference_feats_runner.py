"""Run the mounted torch reference's compute_feats.py main() END-TO-END on CPU.

Drives the reference's own feature-extraction pipeline (compute_feats.py:
128-263) — SimCLR checkpoint surgery, BagDataset patch loading, torch
embedder forward, per-bag %.4f CSVs, per-class lists, shuffled master CSV —
on a shared WSI patch tree, so tpumil's cli/compute_feats output can be
compared file-for-file (tests/test_reference_e2e.py).

Environment-compat shims only (no behavior changes):
  * torchvision is not installed: ``models.resnet18/34/50/101`` are provided
    as factories over tests/torch_resnet_oracle.TorchResNet (torchvision's
    exact module/state-dict layout, pinned by tests/test_resnet.py), and
    ``VF.to_tensor`` with torchvision's exact semantics.
  * CPU execution: .cuda()/FloatTensor redirects as in the other runners.
REF_SEED seeds numpy for the final master-CSV shuffle
(compute_feats.py:262).
"""

import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.environ.get("TPUMIL_REFERENCE", "/root/reference"))

import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

from torch_resnet_oracle import TorchResNet  # noqa: E402


def _to_tensor(pic):
    arr = np.asarray(pic, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
    return t.to(torch.float32).div(255)


def _resnet_factory(depth):
    def make(pretrained=False, norm_layer=nn.InstanceNorm2d):
        assert not pretrained, "no downloads in this container"
        return TorchResNet(depth, norm_layer=norm_layer)
    return make


_tv = types.ModuleType("torchvision")
_tvm = types.ModuleType("torchvision.models")
_tvm.resnet18 = _resnet_factory(18)
_tvm.resnet34 = _resnet_factory(34)
_tvm.resnet50 = _resnet_factory(50)
_tvm.resnet101 = _resnet_factory(101)
_tvt = types.ModuleType("torchvision.transforms")
_tvf = types.ModuleType("torchvision.transforms.functional")
_tvf.to_tensor = _to_tensor
_tv.models = _tvm
_tv.transforms = _tvt
_tvt.functional = _tvf
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.models", _tvm)
sys.modules.setdefault("torchvision.transforms", _tvt)
sys.modules.setdefault("torchvision.transforms.functional", _tvf)

np.random.seed(int(os.environ.get("REF_SEED", "0")))
torch.manual_seed(0)

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
torch.cuda.FloatTensor = torch.FloatTensor
torch.cuda.is_available = lambda: False

import compute_feats  # noqa: E402

sys.argv = ["compute_feats.py"] + sys.argv[1:]
compute_feats.main()
