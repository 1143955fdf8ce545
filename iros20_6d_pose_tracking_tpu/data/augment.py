"""Jittable photometric/geometric augmentations (training-time DR).

Re-designs the reference's cv2/numpy per-worker transforms
(reference data_augmentation.py:48-267) as pure-JAX RNG ops that run
batched on device via ``vmap`` — the TPU replacement for 20 DataLoader
worker processes (reference config.yml:20, train.py:137-143).

Augmentations apply to the OBSERVED branch (B) only — the rendered prior
(A) stays clean — exactly like the reference pipeline (train.py:85-92):
  HSVJitter -> ChangeBright -> GaussianNoise -> GaussianBlur -> BlackCover
(DepthMissing exists but is disabled by default, reference train.py:91.)

Deviations (documented):
  - uint8 wraparound on noise overflow becomes a clip to [0, 255].
  - BlackCover's unbounded rejection loop becomes a fixed number of
    candidate draws with the same >=50%-visibility acceptance rule
    (reference data_augmentation.py:254).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops import image as I

DEPTH_VALID_MIN = 100.0  # mm, reference data_augmentation.py:57


@dataclass(frozen=True)
class AugmentConfig:
    """Magnitudes from the reference config.yml:1-8."""

    hsv_noise: tuple = (15.0, 15.0, 15.0)
    hsv_prob: float = 0.5
    bright_mag: tuple = (0.5, 1.5)
    rgb_noise: float = 2.0
    depth_noise: float = 5.0
    noise_prob: float = 0.5
    blur_max_kernel: int = 6
    blur_prob: float = 0.4
    black_cover_prob: float = 0.2
    black_cover_tries: int = 8
    depth_missing_prob: float = 0.0   # disabled in reference training
    depth_missing_percent: float = 0.4


def hsv_jitter(key, rgb, depth, cfg: AugmentConfig):
    """Per-channel HSV shift on valid-depth pixels
    (reference data_augmentation.py:48-70)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    hsv = I.rgb_to_hsv(rgb)
    shifts = jnp.stack(
        [
            jax.random.uniform(k1, (), minval=-cfg.hsv_noise[0], maxval=cfg.hsv_noise[0]),
            jax.random.uniform(k2, (), minval=-cfg.hsv_noise[1], maxval=cfg.hsv_noise[1]),
            jax.random.uniform(k3, (), minval=-cfg.hsv_noise[2], maxval=cfg.hsv_noise[2]),
        ]
    )
    gates = jnp.stack(
        [
            jax.random.uniform(k4, ()) < cfg.hsv_prob,
            jax.random.uniform(k5, ()) < cfg.hsv_prob,
            jax.random.uniform(k6, ()) < cfg.hsv_prob,
        ]
    )
    hsv = hsv + jnp.where(gates, shifts, 0.0)[None, None, :]
    hsv = jnp.clip(hsv, 0.0, 255.0)
    out = jnp.clip(I.hsv_to_rgb(hsv), 0.0, 255.0)
    mask = (depth > DEPTH_VALID_MIN)[..., None]
    return jnp.where(mask, out, rgb)


def change_bright(key, rgb, cfg: AugmentConfig):
    """Global brightness scale (reference data_augmentation.py:73-81;
    note the reference applies it unconditionally despite its prob arg)."""
    mag = jax.random.uniform(
        key, (), minval=cfg.bright_mag[0], maxval=cfg.bright_mag[1]
    )
    return jnp.clip(rgb * mag, 0.0, 255.0)


def gaussian_noise(key, rgb, depth, cfg: AugmentConfig):
    """Masked additive Gaussian noise on RGB and depth
    (reference data_augmentation.py:85-102)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    mask = depth > DEPTH_VALID_MIN
    std_rgb = jax.random.uniform(k1, (), minval=0.0, maxval=cfg.rgb_noise)
    noise_rgb = jax.random.normal(k2, rgb.shape) * std_rgb
    gate_rgb = jax.random.uniform(k3, ()) < cfg.noise_prob
    rgb = jnp.where(
        gate_rgb & mask[..., None], jnp.clip(rgb + noise_rgb, 0.0, 255.0), rgb
    )
    std_d = jax.random.uniform(k4, (), minval=0.0, maxval=cfg.depth_noise)
    noise_d = jax.random.normal(k5, depth.shape) * std_d
    gate_d = jax.random.uniform(k6, ()) < cfg.noise_prob
    depth = jnp.where(gate_d & mask, depth + noise_d, depth)
    return rgb, depth


def gaussian_blur_aug(key, rgb, depth, cfg: AugmentConfig):
    """Random-odd-kernel blur, sigma 2 (reference
    data_augmentation.py:105-121); rgb and depth gated independently."""
    n = cfg.blur_max_kernel // 2  # ksize in {3, 5, ..., 2n+1}
    ksizes = tuple(2 * i + 1 for i in range(1, n + 1))
    k1, k2, k3, k4 = jax.random.split(key, 4)
    idx_rgb = jax.random.randint(k1, (), 0, len(ksizes))
    idx_d = jax.random.randint(k2, (), 0, len(ksizes))
    blurred_rgb = I.gaussian_blur_select(rgb, ksizes, idx_rgb, 2.0)
    blurred_d = I.gaussian_blur_select(depth, ksizes, idx_d, 2.0)
    rgb = jnp.where(jax.random.uniform(k3, ()) < cfg.blur_prob, blurred_rgb, rgb)
    depth = jnp.where(jax.random.uniform(k4, ()) < cfg.blur_prob, blurred_d, depth)
    return rgb, depth


def black_cover(key, rgb, depth, mask, cfg: AugmentConfig):
    """Quadrant occlusion keeping >=50% object visibility
    (reference data_augmentation.py:217-267). Draws a fixed number of
    candidates and takes the first acceptable one."""
    H, W = depth.shape
    kg, kc = jax.random.split(key)
    apply = jax.random.uniform(kg, ()) < cfg.black_cover_prob
    num_valid = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]

    keys = jax.random.split(kc, cfg.black_cover_tries)

    def candidate(k):
        ku, kv, kq = jax.random.split(k, 3)
        cu = jax.random.randint(ku, (), 0, W)
        cv = jax.random.randint(kv, (), 0, H)
        quad = jax.random.randint(kq, (), 0, 4)
        above = ys < cv
        below = ~above
        left = xs < cu
        right = ~left
        cover = jnp.select(
            [quad == 0, quad == 1, quad == 2, quad == 3],
            [above & left, above & right, below & left, below & right],
        )
        remain = jnp.sum((mask & ~cover).astype(jnp.float32)) / num_valid
        return cover, remain >= 0.5

    covers, oks = jax.vmap(candidate)(keys)
    first = jnp.argmax(oks)  # first acceptable candidate (0 if none)
    any_ok = jnp.any(oks)
    cover = covers[first] & apply & any_ok
    rgb = jnp.where(cover[..., None], 0.0, rgb)
    depth = jnp.where(cover, -9999.0, depth)
    mask = mask & ~cover
    return rgb, depth, mask


def depth_missing(key, depth, cfg: AugmentConfig):
    """Random depth dropout (reference data_augmentation.py:200-214)."""
    k1, k2, k3 = jax.random.split(key, 3)
    apply = jax.random.uniform(k1, ()) < cfg.depth_missing_prob
    frac = jax.random.uniform(k2, (), minval=0.0, maxval=cfg.depth_missing_percent)
    drop = (jax.random.uniform(k3, depth.shape) < frac) & (depth > DEPTH_VALID_MIN)
    return jnp.where(apply & drop, 0.0, depth)


def augment_b(key, rgbB, depthB, maskB, cfg: AugmentConfig):
    """The full B-branch augmentation stack (reference train.py:85-92)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    rgbB = hsv_jitter(k1, rgbB, depthB, cfg)
    rgbB = change_bright(k2, rgbB, cfg)
    rgbB, depthB = gaussian_noise(k3, rgbB, depthB, cfg)
    rgbB, depthB = gaussian_blur_aug(k4, rgbB, depthB, cfg)
    rgbB, depthB, maskB = black_cover(k5, rgbB, depthB, maskB, cfg)
    if cfg.depth_missing_prob > 0:
        depthB = depth_missing(k6, depthB, cfg)
    return rgbB, depthB, maskB


def augment_batch(key, rgbB, depthB, maskB, cfg: AugmentConfig):
    """vmapped batch augmentation: (N,H,W,3), (N,H,W), (N,H,W)."""
    keys = jax.random.split(key, rgbB.shape[0])
    return jax.vmap(lambda k, r, d, m: augment_b(k, r, d, m, cfg))(
        keys, rgbB, depthB, maskB
    )
