"""Run the mounted torch reference's simclr/run.py END-TO-END on CPU.

Drives the reference's own SimCLR pretraining loop (simclr/run.py ->
simclr.SimCLR.train(): manifest glob, DataSetWrapper two-view augmentation,
ResNetSimCLR, NT-Xent, Adam(1e-5), best-validation model.pth) on a shared
WSI patch tree, so tpumil's cli/simclr_train can be compared loop-for-loop
(tests/test_reference_e2e.py::test_reference_e2e_simclr_loop).

Environment-compat shims only (no reference-code changes):
  * torchvision is not installed. ``models.resnet18/50(norm_layer=...)``
    come from tests/torch_resnet_oracle.TorchResNet (torchvision layout,
    pinned by tests/test_resnet.py). The five transforms the reference
    composes (dataset_wrapper.py:48-60) are implemented here FROM THEIR
    DOCUMENTED SEMANTICS (PIL backend): RandomResizedCrop's 10-attempt
    scale/log-ratio sampler + ratio-clamped center-crop fallback,
    HFlip(0.5), ColorJitter via PIL ImageEnhance + HSV hue shift with a
    random op order, RandomGrayscale via L-luma, Compose/RandomApply/
    ToTensor/to_pil_image. RNG draws come from ``random`` — distributional
    parity is the contract here, not bitwise torchvision RNG replay (the
    head-to-head comparison is statistical: loss trajectories and
    checkpoint feature quality).
  * skimage is imported by dataset_wrapper but unused on this code path ->
    stub module.
  * tensorboard SummaryWriter -> scalar recorder with a fixed log_dir, so
    the checkpoint lands at a known path and the train/validation losses
    are captured; a JSON line with both is printed at exit.
  * CPU redirects as in the other reference_*_runner shims.

The reference's config.yaml 'gpu_ids: (0)' evals to the INT 0, which
run.py:31 cannot join over (TypeError) — the config this runner writes uses
'(0,)' (a 1-tuple), a config-level fix, not a code change.
"""

import argparse
import json
import math
import os
import random
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("TPUMIL_REFERENCE", "/root/reference")
sys.path.insert(0, os.path.join(REFERENCE, "simclr"))

import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn as nn  # noqa: E402
from PIL import Image, ImageEnhance  # noqa: E402

from torch_resnet_oracle import TorchResNet  # noqa: E402


# -- torchvision shim ---------------------------------------------------------

def _to_tensor(pic):
    arr = np.asarray(pic, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
    return t.to(torch.float32).div(255)


def _to_pil_image(t):
    arr = t.mul(255).byte().permute(1, 2, 0).numpy()  # trunc, like F.to_pil_image
    return Image.fromarray(arr)


class _Compose:
    def __init__(self, ts):
        self.ts = ts

    def __call__(self, x):
        for t in self.ts:
            x = t(x)
        return x


class _ToTensor:
    def __call__(self, x):
        return _to_tensor(x)


class _RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        return (img.transpose(Image.FLIP_LEFT_RIGHT)
                if random.random() < self.p else img)


class _RandomApply:
    def __init__(self, ts, p=0.5):
        self.ts, self.p = ts, p

    def __call__(self, img):
        if random.random() < self.p:
            for t in self.ts:
                img = t(img)
        return img


class _RandomGrayscale:
    def __init__(self, p=0.1):
        self.p = p

    def __call__(self, img):
        return (img.convert("L").convert("RGB")
                if random.random() < self.p else img)


class _RandomResizedCrop:
    """Documented torchvision semantics: 10 attempts of uniform-scale /
    log-uniform-ratio crop boxes, else a ratio-clamped center crop; bilinear
    resize to (size, size)."""

    def __init__(self, size, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.scale, self.ratio = scale, ratio

    def __call__(self, img):
        w, h = img.size
        area = w * h
        for _ in range(10):
            target = random.uniform(*self.scale) * area
            ar = math.exp(random.uniform(math.log(self.ratio[0]),
                                         math.log(self.ratio[1])))
            cw = int(round(math.sqrt(target * ar)))
            ch = int(round(math.sqrt(target / ar)))
            if 0 < cw <= w and 0 < ch <= h:
                j = random.randint(0, w - cw)
                i = random.randint(0, h - ch)
                box = (j, i, j + cw, i + ch)
                return img.crop(box).resize(self.size, Image.BILINEAR)
        in_ratio = w / h
        if in_ratio < self.ratio[0]:
            cw, ch = w, int(round(w / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            ch, cw = h, int(round(h * self.ratio[1]))
        else:
            cw, ch = w, h
        j, i = (w - cw) // 2, (h - ch) // 2
        return img.crop((j, i, j + cw, i + ch)).resize(self.size, Image.BILINEAR)


class _ColorJitter:
    """brightness/contrast/saturation factors uniform in [max(0,1-v),1+v]
    (PIL ImageEnhance semantics — torchvision's own PIL backend), hue shift
    uniform in [-h,h] as a uint8 H-channel rotation; applied in a random
    order, like torchvision."""

    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
        self.b, self.c, self.s, self.h = brightness, contrast, saturation, hue

    @staticmethod
    def _factor(v):
        return random.uniform(max(0.0, 1.0 - v), 1.0 + v)

    def __call__(self, img):
        ops = []
        if self.b > 0:
            f = self._factor(self.b)
            ops.append(lambda im: ImageEnhance.Brightness(im).enhance(f))
        if self.c > 0:
            g = self._factor(self.c)
            ops.append(lambda im: ImageEnhance.Contrast(im).enhance(g))
        if self.s > 0:
            s = self._factor(self.s)
            ops.append(lambda im: ImageEnhance.Color(im).enhance(s))
        if self.h > 0:
            hf = random.uniform(-self.h, self.h)

            def hue_op(im, hf=hf):
                hsv = np.array(im.convert("HSV"))
                hsv[..., 0] = (hsv[..., 0].astype(np.int16)
                               + int(round(hf * 255))) % 256
                return Image.fromarray(hsv, "HSV").convert("RGB")

            ops.append(hue_op)
        random.shuffle(ops)
        for op in ops:
            img = op(img)
        return img


def _resnet_factory(depth):
    def make(pretrained=False, norm_layer=nn.InstanceNorm2d):
        assert not pretrained, "no downloads in this container"
        # torchvision resnets ship a 1000-way fc head; ResNetSimCLR reads
        # resnet.fc.in_features then drops the head (resnet_simclr.py:14-16)
        return TorchResNet(depth, norm_layer=norm_layer, num_classes=1000)
    return make


_tv = types.ModuleType("torchvision")
_tvm = types.ModuleType("torchvision.models")
for _d in (18, 34, 50, 101):
    setattr(_tvm, f"resnet{_d}", _resnet_factory(_d))
_tvt = types.ModuleType("torchvision.transforms")
_tvf = types.ModuleType("torchvision.transforms.functional")
_tvf.to_tensor = _to_tensor
_tvf.to_pil_image = _to_pil_image
_tvt.functional = _tvf
_tvt.Compose = _Compose
_tvt.ToTensor = _ToTensor
_tvt.RandomResizedCrop = _RandomResizedCrop
_tvt.RandomHorizontalFlip = _RandomHorizontalFlip
_tvt.RandomApply = _RandomApply
_tvt.RandomGrayscale = _RandomGrayscale
_tvt.ColorJitter = _ColorJitter
_tvd = types.ModuleType("torchvision.datasets")
_tv.models = _tvm
_tv.transforms = _tvt
_tv.datasets = _tvd
for _name, _mod in (("torchvision", _tv), ("torchvision.models", _tvm),
                    ("torchvision.transforms", _tvt),
                    ("torchvision.transforms.functional", _tvf),
                    ("torchvision.datasets", _tvd)):
    sys.modules.setdefault(_name, _mod)

# skimage: imported by dataset_wrapper.py:9 but unused on the run.py path
_sk = types.ModuleType("skimage")
_sk.io = types.ModuleType("skimage.io")
_sk.img_as_ubyte = lambda x: np.asarray(x, np.uint8)
sys.modules.setdefault("skimage", _sk)
sys.modules.setdefault("skimage.io", _sk.io)

# tensorboard: fixed log_dir + scalar capture (simclr.py names the
# checkpoint folder off writer.log_dir)
_SCALARS = {}


class _SummaryWriter:
    def __init__(self, log_dir=None):
        self.log_dir = log_dir or os.path.join("runs", "ref")
        os.makedirs(self.log_dir, exist_ok=True)

    def add_scalar(self, tag, value, global_step=None):
        _SCALARS.setdefault(tag, []).append(float(value))


_tb = types.ModuleType("torch.utils.tensorboard")
_tb.SummaryWriter = _SummaryWriter
sys.modules["torch.utils.tensorboard"] = _tb

# CPU redirects (same as the other runners)
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
torch.cuda.FloatTensor = torch.FloatTensor
torch.cuda.is_available = lambda: False

seed = int(os.environ.get("REF_SEED", "0"))
random.seed(seed)
np.random.seed(seed)
torch.manual_seed(seed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--input_size", type=int, default=32)
    ap.add_argument("--valid_size", type=float, default=0.25)
    ap.add_argument("--out_dim", type=int, default=256)
    args = ap.parse_args()

    # the config the reference's run.py reads from cwd (simclr/run.py:28)
    with open("config.yaml", "w") as f:
        f.write(f"""batch_size: {args.batch_size}
epochs: {args.epochs}
eval_every_n_epochs: 1
fine_tune_from: ''
log_every_n_steps: 1
weight_decay: 10e-6
fp16_precision: False
n_gpu: 1
gpu_ids: (0,)

model:
  out_dim: {args.out_dim}
  base_model: "resnet18"

dataset:
  s: 1
  input_shape: ({args.input_size},{args.input_size},3)
  num_workers: 0
  valid_size: {args.valid_size}

loss:
  temperature: 0.5
  use_cosine_similarity: True
""")

    import run as ref_run  # /root/reference/simclr/run.py

    sys.argv = ["run.py", "--level", "low", "--multiscale", "0",
                "--dataset", args.dataset]
    ref_run.main()

    ckpt = os.path.abspath(os.path.join("runs", "ref", "checkpoints",
                                        "model.pth"))
    print("REF_SIMCLR_RESULT " + json.dumps({
        "train_loss": _SCALARS.get("train_loss", []),
        "validation_loss": _SCALARS.get("validation_loss", []),
        "ckpt": ckpt if os.path.exists(ckpt) else None,
    }))


if __name__ == "__main__":
    main()
