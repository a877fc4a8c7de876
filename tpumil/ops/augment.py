"""On-device SimCLR augmentations.

The reference augments on the host with torchvision transforms inside
DataLoader workers (simclr/data_aug/dataset_wrapper.py:48-58): a host-bound
pipeline that cannot keep a TPU fed. Here the whole two-view pipeline runs
batched under jit on device; the host only decodes JPEGs once.

Pipeline (parameter distributions matching the reference's config s=1):
  1. RandomResizedCrop(224): area scale U(0.08, 1), log-ratio U(log 3/4,
     log 4/3), bilinear resample (jax.image.scale_and_translate).
  2. RandomHorizontalFlip p=0.5.
  3. ColorJitter(brightness=0.8, contrast=0.8, saturation=0.8, hue=0.2)
     applied with p=0.8. (torchvision randomizes the operation order per
     call; a fixed order b->c->s->h is used here — the distributions match,
     the composition order is a documented deviation.)
  4. RandomGrayscale p=0.2.
  5. GaussianBlur kernel 13 (int(0.06*224)=13), sigma U(0.1, 2), p=0.5
     (simclr/data_aug/gaussian_blur.py:15-26).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rrc_params(key, h: int, w: int, scale=(0.08, 1.0),
               ratio=(3.0 / 4.0, 4.0 / 3.0), attempts: int = 10):
    """RandomResizedCrop crop-box sampling: returns (ch, cw, y0, x0) floats.

    torchvision semantics: sample up to ``attempts`` (area, aspect) pairs,
    take the FIRST that fits, else fall back to a full center crop —
    clipping oversized draws would skew mass toward full-size crops.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    areas = h * w * jax.random.uniform(k1, (attempts,),
                                       minval=scale[0], maxval=scale[1])
    aspects = jnp.exp(jax.random.uniform(
        k2, (attempts,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])))
    cws = jnp.sqrt(areas * aspects)
    chs = jnp.sqrt(areas / aspects)
    valid = (cws <= w) & (chs <= h) & (cws >= 1) & (chs >= 1)
    first = jnp.argmax(valid)  # first True (0 if none — gated below)
    any_valid = jnp.any(valid)
    # center-crop fallback: the largest in-ratio crop is just the full image
    # clipped to the ratio bounds; torchvision uses the full image when the
    # aspect already fits — approximate with the full frame
    cw = jnp.where(any_valid, cws[first], jnp.float32(w))
    ch = jnp.where(any_valid, chs[first], jnp.float32(h))
    x0 = jnp.where(any_valid, jax.random.uniform(k3) * (w - cw), (w - cw) / 2)
    y0 = jnp.where(any_valid, jax.random.uniform(k4) * (h - ch), (h - ch) / 2)
    return ch, cw, y0, x0


def _random_resized_crop(key, img, out_size: int, scale=(0.08, 1.0),
                         ratio=(3.0 / 4.0, 4.0 / 3.0), attempts: int = 10):
    h, w = img.shape[0], img.shape[1]
    ch, cw, y0, x0 = rrc_params(key, h, w, scale, ratio, attempts)
    # map the crop onto out_size x out_size: out = scale * in + translate
    sy = out_size / ch
    sx = out_size / cw
    translate = jnp.stack([-y0 * sy, -x0 * sx])
    return jax.image.scale_and_translate(
        img, (out_size, out_size, 3), (0, 1), jnp.stack([sy, sx]), translate,
        method="bilinear")


def _rgb_to_gray(img):
    return (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])[..., None]


def _adjust_hue(img, factor):
    """Hue rotation in YIQ space (differentiable, standard approximation of
    torchvision's HSV hue shift)."""
    # RGB -> YIQ
    y = _rgb_to_gray(img)[..., 0]
    i = 0.596 * img[..., 0] - 0.274 * img[..., 1] - 0.322 * img[..., 2]
    q = 0.211 * img[..., 0] - 0.523 * img[..., 1] + 0.312 * img[..., 2]
    angle = factor * 2.0 * jnp.pi
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    i2 = cos * i - sin * q
    q2 = sin * i + cos * q
    r = y + 0.956 * i2 + 0.621 * q2
    g = y - 0.272 * i2 - 0.647 * q2
    b = y - 1.106 * i2 + 1.703 * q2
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


def _color_jitter(key, img, strength: float = 1.0):
    kb, kc, ks, kh = jax.random.split(key, 4)
    b = 0.8 * strength
    c = 0.8 * strength
    s = 0.8 * strength
    hmax = 0.2 * strength
    dt = img.dtype
    img = jnp.clip(img * jax.random.uniform(kb, minval=max(0.0, 1 - b),
                                            maxval=1 + b).astype(dt),
                   0.0, 1.0)
    # reductions in f32 even for bf16 images (a 150k-element bf16 mean
    # loses ~2 decimal digits)
    gray_mean = jnp.mean(_rgb_to_gray(img), dtype=jnp.float32).astype(dt)
    img = jnp.clip(gray_mean + (img - gray_mean)
                   * jax.random.uniform(kc, minval=max(0.0, 1 - c),
                                        maxval=1 + c).astype(dt),
                   0.0, 1.0)
    gray = _rgb_to_gray(img)
    img = jnp.clip(gray + (img - gray)
                   * jax.random.uniform(ks, minval=max(0.0, 1 - s),
                                        maxval=1 + s).astype(dt),
                   0.0, 1.0)
    img = _adjust_hue(img, jax.random.uniform(kh, minval=-hmax,
                                              maxval=hmax).astype(dt))
    return img


def _blur_band(k1d, n: int, r: int, dtype):
    """[n, n + 2r] banded matrix B with B[i, i+j] = k1d[j] — one separable
    blur pass as a matmul (the per-image kernel makes a batched conv
    MXU-hostile 1-channel op under vmap; a band matmul runs on the MXU)."""
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(n + 2 * r)[None, :]
    off = cols - rows
    inb = (off >= 0) & (off <= 2 * r)
    return jnp.where(inb, k1d[jnp.clip(off, 0, 2 * r)], 0.0).astype(dtype)


def _gaussian_blur(key, img, kernel_size: int = 13):
    """sigma ~ U[0.1, 2], reflect-101 border like cv2.GaussianBlur (zero
    padding would darken a 2r-pixel vignette frame on every blurred view).
    Implemented as two banded matmuls: f32 images pin Precision.HIGHEST so
    the math stays cv2-parity (TPU DEFAULT would feed the MXU bf16 inputs);
    bf16 images (the SimCLR throughput mode) use the fast path."""
    sigma = jax.random.uniform(key, minval=0.1, maxval=2.0)
    r = kernel_size // 2
    xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k1d = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k1d = k1d / jnp.sum(k1d)
    h, w = img.shape[0], img.shape[1]
    padded = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="reflect")
    prec = jax.lax.Precision.HIGHEST if img.dtype == jnp.float32 else None
    bh = _blur_band(k1d, h, r, img.dtype)
    rows_done = jnp.einsum("ij,jwc->iwc", bh, padded, precision=prec,
                           preferred_element_type=jnp.float32)  # [h, w+2r, 3]
    bw = bh if h == w else _blur_band(k1d, w, r, img.dtype)
    return jnp.einsum("ij,hjc->hic", bw, rows_done.astype(img.dtype),
                      precision=prec,
                      preferred_element_type=jnp.float32).astype(img.dtype)


def augment_one(key, img, out_size: int = 224, strength: float = 1.0,
                blur_kernel: int = 13, compute_dtype=None):
    """One SimCLR view of one image ([H, W, 3] float in [0, 1]).

    compute_dtype=bf16 halves the HBM traffic of this bandwidth-bound
    pipeline (the SimCLR trainer's throughput mode — views feed a bf16
    backbone anyway); None keeps the input dtype (f32 = parity mode, every
    matmul pinned to true f32)."""
    keys = jax.random.split(key, 7)
    if compute_dtype is not None:
        img = img.astype(compute_dtype)
    img = _random_resized_crop(keys[0], img, out_size)
    img = jnp.where(jax.random.bernoulli(keys[1]), img[:, ::-1, :], img)
    img = jnp.where(jax.random.bernoulli(keys[2], 0.8),
                    _color_jitter(keys[3], img, strength), img)
    img = jnp.where(jax.random.bernoulli(keys[4], 0.2),
                    jnp.broadcast_to(_rgb_to_gray(img), img.shape), img)
    # independent keys for the apply coin and the sigma draw
    img = jnp.where(jax.random.bernoulli(keys[5], 0.5),
                    _gaussian_blur(keys[6], img, blur_kernel), img)
    return jnp.clip(img, 0.0, 1.0)


def pair_keys(key, b: int):
    """The canonical per-image key derivation for a two-view batch:
    ``(keys1 [b, 2], keys2 [b, 2])``. The SINGLE source of it — both
    `augment_pair_batch` and the SimCLR trainer's monolithic/grad-cache
    steps derive keys here, so "a microbatch slice of (keys, images) sees
    bitwise the full-batch views" stays true by construction."""
    k1, k2 = jax.random.split(key)
    return jax.random.split(k1, b), jax.random.split(k2, b)


@partial(jax.jit, static_argnums=(2, 3, 4))
def augment_pair_batch(key, images, out_size: int = 224, compute_dtype=None,
                       strength: float = 1.0):
    """Two independent views for a batch: [B, H, W, 3] -> (view1, view2),
    each [B, out_size, out_size, 3] (SimCLRDataTransform,
    dataset_wrapper.py:80-87). compute_dtype: see augment_one. strength =
    the reference's color-jitter ``s`` (config.yaml dataset.s,
    dataset_wrapper.py:48)."""
    keys1, keys2 = pair_keys(key, images.shape[0])
    return augment_pair_batch_keyed(keys1, keys2, images,
                                    out_size, compute_dtype, strength)


def augment_pair_batch_keyed(keys1, keys2, images, out_size: int = 224,
                             compute_dtype=None, strength: float = 1.0):
    """`augment_pair_batch` with the per-image keys supplied by the caller.

    Slicing (keys, images) together and calling this per slice yields
    bitwise-identical views to one full-batch call — the property the
    SimCLR gradient-cache step relies on to microbatch the encoder while
    keeping the monolithic step's exact augmentations."""
    one = lambda k, im: augment_one(k, im, out_size, strength=strength,
                                    compute_dtype=compute_dtype)
    v1 = jax.vmap(one)(keys1, images)
    v2 = jax.vmap(one)(keys2, images)
    return v1, v2
