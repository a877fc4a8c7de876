"""Run the mounted torch reference's attention_map.py test() END-TO-END on CPU.

Drives the reference's own heatmap pipeline (attention_map.py:59-118) —
BagDataset patch loading, torch milnet forward (embedder + DSMIL aggregator),
class detection, attention coloring, grid render — on a shared bag of patch
images, so tpumil's cli/attention_map output can be compared pixel-for-pixel
(tests/test_reference_e2e.py).

Environment-compat shims only (no behavior changes):
  * torchvision is not installed: attention_map.py imports it for
    ``VF.to_tensor`` (attention_map.py:38) and ``models.resnet18``
    (attention_map.py:141-143, main() only). ``to_tensor`` is provided with
    torchvision's exact semantics (PIL -> CHW float / 255); the resnet comes
    from tests/torch_resnet_oracle.TorchResNet, which replicates torchvision's
    resnet18 module/state-dict layout (pinned against the reference numerics
    by tests/test_resnet.py).
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

The model assembly replicates attention_map.py main() (lines 139-165):
InstanceNorm2d resnet18 with fc=Identity, SimCLR-checkpoint popitem x 4 +
positional zip load, aggregator load with the i_classifier.fc.0 -> fc rename.
np.random is seeded BEFORE test() so the per-class heatmap colors
(attention_map.py:63) are reproducible on the tpumil side.
"""

import argparse
import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.environ.get("TPUMIL_REFERENCE", "/root/reference"))

import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn as nn  # noqa: E402
from PIL import Image  # noqa: E402

from tpumil.ops import image as _img  # noqa: E402

# ---- torchvision stub (to_tensor with torchvision's exact semantics) -------


def _to_tensor(pic):
    arr = np.asarray(pic, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
    return t.to(torch.float32).div(255)


_tv = types.ModuleType("torchvision")
_tvm = types.ModuleType("torchvision.models")
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

import attention_map  # noqa: E402
import dsmil as mil  # noqa: E402
from collections import OrderedDict  # noqa: E402

from torch_resnet_oracle import TorchResNet  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--feats_size", type=int, default=512)
    p.add_argument("--thres", nargs="+", type=float, required=True)
    p.add_argument("--class_name", nargs="+", type=str, default=None)
    p.add_argument("--embedder_weights", type=str, required=True)
    p.add_argument("--aggregator_weights", type=str, required=True)
    p.add_argument("--bag_path", type=str, required=True)
    p.add_argument("--patch_ext", type=str, default="jpg")
    p.add_argument("--map_path", type=str, required=True)
    p.add_argument("--export_scores", type=int, default=1)
    p.add_argument("--score_path", type=str, required=True)
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    # attention_map.py:139-147 (model assembly; oracle resnet, see docstring)
    resnet = TorchResNet(18, norm_layer=nn.InstanceNorm2d)
    for param in resnet.parameters():
        param.requires_grad = False
    resnet.fc = nn.Identity()
    i_classifier = mil.IClassifier(resnet, args.feats_size,
                                   output_class=args.num_classes)
    b_classifier = mil.BClassifier(input_size=args.feats_size,
                                   output_class=args.num_classes)
    milnet = mil.MILNet(i_classifier, b_classifier)

    # attention_map.py:152-161 (SimCLR popitem x 4 + positional zip load)
    state_dict_weights = torch.load(args.embedder_weights, map_location="cpu")
    new_state_dict = OrderedDict()
    for _ in range(4):
        state_dict_weights.popitem()
    state_dict_init = i_classifier.state_dict()
    for (k, v), (k_0, v_0) in zip(state_dict_weights.items(),
                                  state_dict_init.items()):
        new_state_dict[k_0] = v
    i_classifier.load_state_dict(new_state_dict, strict=False)

    # attention_map.py:163-166 (aggregator load, fc.0 -> fc rename)
    state_dict_weights = torch.load(args.aggregator_weights, map_location="cpu")
    state_dict_weights["i_classifier.fc.weight"] = \
        state_dict_weights["i_classifier.fc.0.weight"]
    state_dict_weights["i_classifier.fc.bias"] = \
        state_dict_weights["i_classifier.fc.0.bias"]
    milnet.load_state_dict(state_dict_weights, strict=False)

    bags_list = sorted(
        d.path for d in os.scandir(args.bag_path) if d.is_dir())
    os.makedirs(args.map_path, exist_ok=True)
    os.makedirs(args.score_path, exist_ok=True)
    if args.class_name is None:
        args.class_name = [f"class {c}" for c in range(args.num_classes)]

    np.random.seed(args.seed)  # colors (attention_map.py:63)
    milnet.eval()
    attention_map.test(args, bags_list, milnet)
    colors = []  # replay the draw for the comparison side
    np.random.seed(args.seed)
    for _ in range(args.num_classes):
        colors.append(np.random.choice(range(256), size=3).tolist())
    print("REF_COLORS:" + json.dumps(colors))


if __name__ == "__main__":
    main()
