"""Augmentation pipeline tests (bounds, masks, determinism, batch vmap)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iros20_6d_pose_tracking_tpu.data import augment as A


def _sample(seed=0, H=48, W=48):
    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 255, size=(H, W, 3)).astype(np.float32)
    depth = np.full((H, W), 600.0, np.float32)
    depth[: H // 4] = 0.0  # invalid strip
    mask = depth > 100
    return jnp.array(rgb), jnp.array(depth), jnp.array(mask)


def test_hsv_jitter_respects_mask_and_range():
    rgb, depth, _ = _sample()
    out = A.hsv_jitter(jax.random.PRNGKey(1), rgb, depth,
                       A.AugmentConfig(hsv_prob=1.0))
    out = np.array(out)
    assert out.min() >= 0 and out.max() <= 255
    # Invalid-depth region untouched (reference data_augmentation.py:68).
    np.testing.assert_array_equal(out[:12], np.array(rgb)[:12])


def test_change_bright_scales():
    rgb, _, _ = _sample()
    out = np.array(A.change_bright(jax.random.PRNGKey(0), rgb,
                                   A.AugmentConfig(bright_mag=(2.0, 2.0))))
    np.testing.assert_allclose(out, np.clip(np.array(rgb) * 2.0, 0, 255), atol=1e-4)


def test_gaussian_noise_masked():
    rgb, depth, _ = _sample()
    cfg = A.AugmentConfig(noise_prob=1.0, rgb_noise=10.0, depth_noise=20.0)
    out_rgb, out_depth = A.gaussian_noise(jax.random.PRNGKey(2), rgb, depth, cfg)
    out_rgb, out_depth = np.array(out_rgb), np.array(out_depth)
    np.testing.assert_array_equal(out_rgb[:12], np.array(rgb)[:12])
    np.testing.assert_array_equal(out_depth[:12], np.array(depth)[:12])
    assert not np.allclose(out_depth[20:], np.array(depth)[20:])


def test_black_cover_preserves_half_visibility():
    rgb, depth, mask = _sample()
    cfg = A.AugmentConfig(black_cover_prob=1.0)
    n0 = int(np.array(mask).sum())
    for seed in range(8):
        _, _, m = A.black_cover(jax.random.PRNGKey(seed), rgb, depth, mask, cfg)
        assert int(np.array(m).sum()) >= 0.5 * n0 - 1


def test_depth_missing_only_drops_valid():
    _, depth, _ = _sample()
    cfg = A.AugmentConfig(depth_missing_prob=1.0, depth_missing_percent=0.9)
    out = np.array(A.depth_missing(jax.random.PRNGKey(3), depth, cfg))
    assert (out[:12] == np.array(depth)[:12]).all()
    assert (out == 0).sum() > 0


@pytest.mark.slow
def test_batch_augment_shapes_and_determinism():
    rgb, depth, mask = _sample()
    rgbB = jnp.stack([rgb] * 4)
    depthB = jnp.stack([depth] * 4)
    maskB = jnp.stack([mask] * 4)
    cfg = A.AugmentConfig()
    r1, d1, m1 = A.augment_batch(jax.random.PRNGKey(7), rgbB, depthB, maskB, cfg)
    r2, d2, m2 = A.augment_batch(jax.random.PRNGKey(7), rgbB, depthB, maskB, cfg)
    assert r1.shape == rgbB.shape and d1.shape == depthB.shape
    np.testing.assert_array_equal(np.array(r1), np.array(r2))
    # Different per-sample keys -> samples differ from each other.
    assert not np.allclose(np.array(r1[0]), np.array(r1[1]))
