"""Run the mounted torch reference's attention_map.py END-TO-END on CPU.

Executes the reference script's own ``__main__`` block via runpy — model
assembly (InstanceNorm resnet18, SimCLR popitem x 4 + positional zip load,
aggregator ``i_classifier.fc.0 -> fc`` rename, attention_map.py:139-165) and
the heatmap ``test()`` loop (attention_map.py:59-118) are all the
reference's unmodified code — so tpumil's cli/attention_map output can be
compared pixel-for-pixel (tests/test_reference_e2e.py).

Environment-compat shims only (no behavior changes):
  * torchvision is not installed: ``models.resnet18/34/...`` are provided as
    factories over tests/torch_resnet_oracle.TorchResNet (torchvision's
    exact module/state-dict layout, pinned by tests/test_resnet.py), and
    ``VF.to_tensor`` with torchvision's exact semantics
    (attention_map.py:38).
  * skimage is not installed: ``exposure.rescale_intensity`` /
    ``transform.resize(order=0)`` / ``img_as_ubyte`` / ``io.imsave``
    (attention_map.py:107-113) are provided by tpumil.ops.image, whose
    skimage parity is pinned separately (tests/test_heatmap.py). The final
    quantize/upscale/save stage is therefore SHARED between the two sides of
    the head-to-head; everything upstream of it — the torch model forward,
    attention, detection, coloring, grid fill — is the reference's own code
    against tpumil's independent implementation.
  * CPU execution: .cuda()/FloatTensor redirected as in
    tests/reference_cpu_runner.py.

np.random is seeded BEFORE the script runs so the per-class heatmap colors
(attention_map.py:63) are reproducible; the same draw is replayed afterwards
and printed as one REF_COLORS json line for the tpumil side.
"""

import json
import os
import runpy
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("TPUMIL_REFERENCE", "/root/reference")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REFERENCE)

import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn as nn  # noqa: E402
from PIL import Image  # noqa: E402

from torch_resnet_oracle import TorchResNet  # noqa: E402

from tpumil.ops import image as _img  # noqa: E402

# ---- torchvision stub ------------------------------------------------------


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

# ---- skimage stub (tpumil.ops.image equivalents, see module docstring) -----
_sk = types.ModuleType("skimage")
_ske = types.ModuleType("skimage.exposure")
_ski = types.ModuleType("skimage.io")
_skt = types.ModuleType("skimage.transform")


def _rescale_intensity(image, out_range=(0, 1)):
    return _img.rescale_intensity(image, out_range)


def _resize(image, output_shape, order=0):
    assert order == 0, "runner only implements the reference's order-0 call"
    fh = output_shape[0] // image.shape[0]
    fw = output_shape[1] // image.shape[1]
    assert (fh == fw and fh * image.shape[0] == output_shape[0]
            and fw * image.shape[1] == output_shape[1]), \
        "non-integer resize factor (reference uses x32)"
    return _img.upscale_nearest(image, fh)


def _imsave(path, arr):
    Image.fromarray(arr).save(path)


_ske.rescale_intensity = _rescale_intensity
_ski.imsave = _imsave
_skt.resize = _resize
_sk.exposure = _ske
_sk.io = _ski
_sk.transform = _skt
_sk.img_as_ubyte = _img.img_as_ubyte
sys.modules.setdefault("skimage", _sk)
sys.modules.setdefault("skimage.exposure", _ske)
sys.modules.setdefault("skimage.io", _ski)
sys.modules.setdefault("skimage.transform", _skt)

# ---- CPU shims -------------------------------------------------------------
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
torch.cuda.FloatTensor = torch.FloatTensor
torch.cuda.is_available = lambda: False


def main():
    import argparse

    # --seed is runner-local (the reference draws colors unseeded); every
    # other argument passes straight through to attention_map.py's argparse
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--seed", type=int,
                     default=int(os.environ.get("REF_SEED", "0")))
    ns, rest = pre.parse_known_args()
    seed = ns.seed
    sys.argv = ["attention_map.py"] + rest
    np.random.seed(seed)  # colors (attention_map.py:63)
    runpy.run_path(os.path.join(REFERENCE, "attention_map.py"),
                   run_name="__main__")
    # replay the color draw for the comparison side
    num_classes = 2
    if "--num_classes" in sys.argv:
        num_classes = int(sys.argv[sys.argv.index("--num_classes") + 1])
    np.random.seed(seed)
    colors = [np.random.choice(range(256), size=3).tolist()
              for _ in range(num_classes)]
    print("REF_COLORS:" + json.dumps(colors))


if __name__ == "__main__":
    main()
