"""Se3TrackNet in Flax (NHWC, TPU-native layouts).

Architecture parity with reference se3_tracknet.py:52-121 and
network_modules.py:49-120, with the reference's quirks preserved:

  - "ConvBNReLU" is actually Conv + BatchNorm + SELU
    (reference network_modules.py:59-66).
  - ResNet basic blocks use ReLU and bias-less 3x3 convs by default; the
    model instantiates them with bias=True (reference se3_tracknet.py:59).
  - Branch A (rendered prior) has ONE post-stem residual block; branch B
    (real observation) has TWO (reference se3_tracknet.py:57-64).
  - The fusion trunk has a single 256-ch residual block: the reference
    assigns ``convAB2`` twice and the second assignment wins
    (reference se3_tracknet.py:67-68).
  - Two heads (translation / rotation): ConvBNSELU(256->512, s2) +
    ResBlock(512) + global average pool + Linear(512->3) + tanh
    (reference se3_tracknet.py:70-78).

Padding matches PyTorch exactly: explicit symmetric ((k-1)//2, (k-1)//2)
pads (XLA 'SAME' differs for even strides). Data layout is NHWC and conv
kernels HWIO — the TPU-native choice; the PyTorch checkpoint importer in
``torch_import.py`` transposes accordingly.

Compute dtype is configurable: bf16 activations with f32 parameters/batch
stats is the TPU fast path; tests run f32 for tight parity.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBNSELU(nn.Module):
    """Conv(k, s, torch-style pad, bias) + BatchNorm + SELU.

    Parity: reference network_modules.py:59-66 (class name there is
    ConvBNReLU but the activation is SELU).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        return jax.nn.selu(x)


class ResnetBasicBlock(nn.Module):
    """conv3x3-BN-ReLU-conv3x3-BN + identity, ReLU.

    Parity: reference network_modules.py:86-120 (stride 1, no downsample —
    the only configuration the model uses, reference se3_tracknet.py:59-76).
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=self.use_bias,
            dtype=self.dtype, name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=self.use_bias,
            dtype=self.dtype, name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(y)
        return nn.relu(y + identity)


def _max_pool_3x3_s2(x):
    """MaxPool(k=3, s=2, pad=1), parity with reference se3_tracknet.py:58."""
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
    )


class Se3TrackNet(nn.Module):
    """Two-branch relative-pose regressor (reference se3_tracknet.py:52-112).

    Inputs are NHWC 4-channel (RGB + offset depth) crops of the rendered
    prior (A) and the observed frame (B). Output dict mirrors the
    reference: {'feature', 'trans', 'rot'} with trans/rot tanh-bounded.
    """

    image_size: int = 176
    rot_dim: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, A, B, train: bool = False):
        A = A.astype(self.dtype)
        B = B.astype(self.dtype)

        a = ConvBNSELU(64, 7, 2, dtype=self.dtype, name="convA1")(A, train)
        a = _max_pool_3x3_s2(a)
        a = ResnetBasicBlock(64, dtype=self.dtype, name="convA2")(a, train)

        b = ConvBNSELU(64, 7, 2, dtype=self.dtype, name="convB1")(B, train)
        b = _max_pool_3x3_s2(b)
        b = ResnetBasicBlock(64, dtype=self.dtype, name="convB2")(b, train)
        b = ResnetBasicBlock(64, dtype=self.dtype, name="convB3")(b, train)

        ab = jnp.concatenate([a, b], axis=-1)
        ab = ConvBNSELU(256, 3, 2, dtype=self.dtype, name="convAB1")(ab, train)
        ab = ResnetBasicBlock(256, dtype=self.dtype, name="convAB2")(ab, train)
        feature = ab

        t = ConvBNSELU(512, 3, 2, dtype=self.dtype, name="trans_conv1")(ab, train)
        t = ResnetBasicBlock(512, dtype=self.dtype, name="trans_conv2")(t, train)
        t = jnp.mean(t, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        t = nn.Dense(3, dtype=self.dtype, name="trans_out")(t)
        t = jnp.tanh(t)

        r = ConvBNSELU(512, 3, 2, dtype=self.dtype, name="rot_conv1")(ab, train)
        r = ResnetBasicBlock(512, dtype=self.dtype, name="rot_conv2")(r, train)
        r = jnp.mean(r, axis=(1, 2))
        r = nn.Dense(self.rot_dim, dtype=self.dtype, name="rot_out")(r)
        r = jnp.tanh(r)

        return {
            "feature": feature,
            "trans": t.astype(jnp.float32),
            "rot": r.astype(jnp.float32),
        }


def loss_fn(pred_trans, pred_rot, target_trans, target_rot,
            trans_weight: float = 1.0, rot_weight: float = 1.0,
            sample_weight=None):
    """MSE(trans) + MSE(rot), parity with reference se3_tracknet.py:114-121
    weighted per reference problems.py:91 / config.yml loss_weights.

    ``sample_weight`` (B,): optional per-sample mask/weights — the mean
    becomes a weighted mean over samples (used to mask padded validation
    batches; equals the plain mean when all weights are 1)."""
    se_t = jnp.mean((pred_trans.astype(jnp.float32) - target_trans) ** 2,
                    axis=-1)
    se_r = jnp.mean((pred_rot.astype(jnp.float32) - target_rot) ** 2,
                    axis=-1)
    if sample_weight is None:
        trans_loss = jnp.mean(se_t)
        rot_loss = jnp.mean(se_r)
    else:
        w = sample_weight.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(w), 1.0)
        trans_loss = jnp.sum(se_t * w) / denom
        rot_loss = jnp.sum(se_r * w) / denom
    total = trans_weight * trans_loss + rot_weight * rot_loss
    return total, {"trans": trans_loss, "rot": rot_loss}


def create_model(image_size: int = 176, dtype=jnp.float32) -> Se3TrackNet:
    return Se3TrackNet(image_size=image_size, dtype=dtype)


def init_variables(model: Se3TrackNet, key: jax.Array, batch: int = 1):
    s = model.image_size
    dummy = jnp.zeros((batch, s, s, 4), jnp.float32)
    return model.init(key, dummy, dummy, train=False)
