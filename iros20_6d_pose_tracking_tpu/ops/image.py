"""cv2-compatible image ops in pure JAX (resize, blur, HSV).

These exist so the whole data path — training augmentation
(reference data_augmentation.py) and inference preprocessing — runs on
device with static shapes. Conventions intentionally track OpenCV:

  - ``resize_nearest``: cv2 INTER_NEAREST source-index rule
    ``src = floor(dst * src_size/dst_size)`` (used at reference
    Utils.py:343-344, datasets.py:97-101).
  - ``gaussian_blur``: cv2.GaussianBlur kernel (getGaussianKernel) with
    BORDER_REFLECT_101 padding (reference data_augmentation.py:116,120).
  - ``rgb_to_hsv`` / ``hsv_to_rgb``: cv2 uint8 scaling — H in [0, 180),
    S, V in [0, 255] (reference data_augmentation.py:58,68).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def resize_nearest(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """cv2 INTER_NEAREST resize. img is (H, W) or (H, W, C)."""
    H_out, W_out = out_hw
    h, w = img.shape[0], img.shape[1]
    rr = (jnp.arange(H_out, dtype=jnp.int32) * h) // H_out
    cc = (jnp.arange(W_out, dtype=jnp.int32) * w) // W_out
    return img[rr[:, None], cc[None, :]]


def gaussian_kernel_1d(ksize: int, sigma: float) -> jnp.ndarray:
    """cv2.getGaussianKernel: normalized Gaussian taps.

    For sigma <= 0, cv2 uses sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8.
    """
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) * 0.5
    xs = jnp.arange(ksize, dtype=jnp.float32) - half
    k = jnp.exp(-(xs * xs) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def _reflect101_pad(img: jax.Array, pad: int, axes=(0, 1)) -> jax.Array:
    pad_width = [(0, 0)] * img.ndim
    for a in axes:
        pad_width[a] = (pad, pad)
    return jnp.pad(img, pad_width, mode="reflect")


def gaussian_blur(img: jax.Array, ksize: int, sigma: float) -> jax.Array:
    """Separable Gaussian blur, cv2.GaussianBlur-compatible.

    img: (H, W) or (H, W, C) float. Static ksize.
    """
    k = gaussian_kernel_1d(ksize, sigma)
    pad = ksize // 2
    x = _reflect101_pad(img.astype(jnp.float32), pad)
    # Horizontal then vertical 1-D convolutions via shifted adds (ksize is
    # small — <= 9 in the reference config — so unrolled taps fuse well).
    H, W = img.shape[0], img.shape[1]
    acc = None
    for i in range(ksize):
        sl = x[:, i : i + W]
        acc = sl * k[i] if acc is None else acc + sl * k[i]
    x = acc
    acc = None
    for i in range(ksize):
        sl = x[i : i + H]
        acc = sl * k[i] if acc is None else acc + sl * k[i]
    return acc


def gaussian_blur_select(
    img: jax.Array, ksizes: tuple[int, ...], idx: jax.Array, sigma: float
) -> jax.Array:
    """Blur with a runtime-selected kernel size from a static bank.

    The reference draws ksize uniformly from odd sizes (reference
    data_augmentation.py:113-120); under jit the size must be static, so we
    evaluate the bank lazily via ``lax.switch``.
    """
    branches = [lambda im, k=k: gaussian_blur(im, k, sigma) for k in ksizes]
    return jax.lax.switch(idx, branches, img)


def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """cv2 COLOR_RGB2HSV on uint8-scaled floats: H in [0,180), S,V in [0,255]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    safe_diff = jnp.where(diff > 0, diff, 1.0)
    s = jnp.where(v > 0, diff / jnp.maximum(v, 1e-12) * 255.0, 0.0)
    h = jnp.where(
        v == r,
        60.0 * (g - b) / safe_diff,
        jnp.where(
            v == g,
            120.0 + 60.0 * (b - r) / safe_diff,
            240.0 + 60.0 * (r - g) / safe_diff,
        ),
    )
    h = jnp.where(diff > 0, h, 0.0)
    h = jnp.where(h < 0, h + 360.0, h) * 0.5
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    """Inverse of :func:`rgb_to_hsv` (H in [0,180), S,V in [0,255])."""
    h = (hsv[..., 0] * 2.0) % 360.0
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2]
    hp = h / 60.0
    i = jnp.floor(hp).astype(jnp.int32) % 6
    f = hp - jnp.floor(hp)
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# --- grayscale morphology (building blocks for depth hole filling) ---------

def dilate(img: jax.Array, kernel) -> jax.Array:
    """Grayscale dilation with a binary structuring element (cv2.dilate,
    BORDER_CONSTANT with -inf identity). kernel: 2-D numpy/array of {0,1}."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    neg = jnp.finfo(jnp.float32).min
    x = jnp.pad(img.astype(jnp.float32), ((ph, ph), (pw, pw)), constant_values=neg)
    H, W = img.shape
    out = jnp.full(img.shape, neg, dtype=jnp.float32)
    for i in range(kh):
        for j in range(kw):
            if float(kernel[i][j] if not hasattr(kernel, "shape") else kernel[i, j]):
                out = jnp.maximum(out, x[i : i + H, j : j + W])
    return out


def erode(img: jax.Array, kernel) -> jax.Array:
    return -dilate(-img, kernel)


def morph_close(img: jax.Array, kernel) -> jax.Array:
    return erode(dilate(img, kernel), kernel)


def median_blur(img: jax.Array, ksize: int = 5) -> jax.Array:
    """cv2.medianBlur (BORDER_REPLICATE)."""
    p = ksize // 2
    x = jnp.pad(img, ((p, p), (p, p)), mode="edge")
    H, W = img.shape
    taps = jnp.stack(
        [x[i : i + H, j : j + W] for i in range(ksize) for j in range(ksize)], axis=-1
    )
    return jnp.sort(taps, axis=-1)[..., (ksize * ksize) // 2]


def bilateral_filter(
    img: jax.Array, d: int, sigma_color: float, sigma_space: float
) -> jax.Array:
    """cv2.bilateralFilter for single-channel float images (BORDER_REPLICATE)."""
    radius = d // 2
    p = radius
    x = jnp.pad(img, ((p, p), (p, p)), mode="edge")
    H, W = img.shape
    num = jnp.zeros(img.shape, jnp.float32)
    den = jnp.zeros(img.shape, jnp.float32)
    inv2sc = -0.5 / (sigma_color * sigma_color)
    inv2ss = -0.5 / (sigma_space * sigma_space)
    for i in range(d):
        for j in range(d):
            dy, dx = i - radius, j - radius
            if dy * dy + dx * dx > radius * radius + 1e-9 and d > 1:
                # cv2 uses a circular neighbourhood of radius d/2.
                continue
            tap = x[i : i + H, j : j + W]
            ws = math.exp((dy * dy + dx * dx) * inv2ss)
            wc = jnp.exp((tap - img) ** 2 * inv2sc)
            w = ws * wc
            num = num + w * tap
            den = den + w
    return num / jnp.maximum(den, 1e-12)
