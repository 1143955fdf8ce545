"""Training runtime: Adam + MultiStep schedule, jitted step, resume.

Hyperparameter parity with the reference trainer (reference train.py:66-165,
problems.py:60-154, config.yml):
  - Adam(lr=1e-3, betas=(0.9, 0.99), weight_decay=1e-6) with torch
    semantics (L2 term added to the gradient BEFORE the Adam moments),
    reference train.py:156.
  - MultiStepLR milestones [100, 200, 300] epochs, gamma 0.1
    (reference train.py:159), 300 epochs, batch 200 (config.yml:12,19).
  - Loss = w_t * MSE(trans) + w_r * MSE(rot) (reference problems.py:91).
  - Dataset mean/std pass reproducing the reference's statistic: the
    std is taken over per-batch channel MEANS, not over pixels
    (reference train.py:106-125) — quirky but what checkpoints expect.

TPU-first differences: the whole step (augment -> normalize -> label
encode -> fwd/bwd -> Adam) is ONE jitted program with donated state;
the input pipeline is either host tensors or the on-device SyntheticPairs
renderer; checkpoints carry optimizer state and support resume
(the reference cannot, SURVEY.md section 5).
"""
from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..core import se3
from ..data import augment as aug
from ..models import tracknet
from ..tracking.tracker import normalize_pair
from . import checkpoint as ckpt


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 1e-6
    betas: tuple = (0.9, 0.99)
    epochs: int = 300
    batch_size: int = 200
    milestones: tuple = (100, 200, 300)
    gamma: float = 0.1
    trans_loss_weight: float = 1.0
    rot_loss_weight: float = 1.0
    trans_normalizer: float = 0.02          # dataset_info.yml:12
    rot_normalizer: float = 15 * np.pi / 180  # dataset_info.yml:13
    resolution: int = 176
    aug: aug.AugmentConfig = aug.AugmentConfig()
    seed: int = 0


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    epoch: jax.Array


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """torch.optim.Adam + MultiStepLR equivalent."""
    boundaries = {
        int(m) * steps_per_epoch: cfg.gamma for m in cfg.milestones
    }
    schedule = optax.piecewise_constant_schedule(cfg.learning_rate, boundaries)
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),  # torch Adam wd semantics
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    )
    return tx, schedule


def create_train_state(model, cfg: TrainConfig, tx, key) -> TrainState:
    variables = tracknet.init_variables(model, key)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )


def preprocess_batch(key, raw, mean, std, cfg: TrainConfig, train: bool):
    """Raw pair batch -> (bufA, bufB, trans_label, rot_label), on device.

    Applies the B-branch augmentation stack in train mode (reference
    train.py:85-92), then OffsetDepth/NormalizeChannels/pack (reference
    posttransforms, train.py:130) and the label codec
    (reference datasets.py:141-150).
    """
    rgbA = jnp.asarray(raw["rgbA"], jnp.float32)
    depthA = jnp.asarray(raw["depthA"], jnp.float32)
    rgbB = jnp.asarray(raw["rgbB"], jnp.float32)
    depthB = jnp.asarray(raw["depthB"], jnp.float32)
    maskB = jnp.asarray(raw["maskB"]) > 0
    A_in_cam = jnp.asarray(raw["A_in_cam"], jnp.float32)
    B_in_cam = jnp.asarray(raw["B_in_cam"], jnp.float32)

    if train:
        rgbB, depthB, maskB = aug.augment_batch(key, rgbB, depthB, maskB, cfg.aug)

    bufA, bufB = jax.vmap(
        lambda ra, da, rb, db, pa: normalize_pair(ra, da, rb, db, pa, mean, std)
    )(rgbA, depthA, rgbB, depthB, A_in_cam)

    t_label, r_label = se3.encode_delta(
        A_in_cam, B_in_cam, cfg.trans_normalizer, cfg.rot_normalizer
    )
    return bufA, bufB, t_label, r_label


def train_step_impl(model, tx, cfg: TrainConfig, state: TrainState, key,
                    raw_batch, mean, std):
    """Un-jitted step body — reused by the jitted single-device step below
    and by the SPMD wrappers in parallel/spmd.py (vmapped over an
    object-ensemble axis and sharded over a device mesh)."""
    bufA, bufB, t_label, r_label = preprocess_batch(
        key, raw_batch, mean, std, cfg, train=True
    )

    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            bufA, bufB, train=True, mutable=["batch_stats"],
        )
        total, parts = tracknet.loss_fn(
            out["trans"], out["rot"], t_label, r_label,
            cfg.trans_loss_weight, cfg.rot_loss_weight,
        )
        return total, (parts, mutated["batch_stats"])

    (loss, (parts, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt,
        step=state.step + 1,
    )
    metrics = {"loss": loss, "trans": parts["trans"], "rot": parts["rot"]}
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("model", "tx", "cfg"),
                   donate_argnames=("state",))
def train_step(model, tx, cfg: TrainConfig, state: TrainState, key,
               raw_batch, mean, std):
    return train_step_impl(model, tx, cfg, state, key, raw_batch, mean, std)


@functools.partial(
    jax.jit,
    static_argnames=("model", "tx", "cfg", "batch_size", "resolution",
                     "max_trans", "max_rot_deg", "xyz_range", "dr",
                     "impl"),
    donate_argnames=("state",))
def train_step_synth(model, tx, cfg: TrainConfig, state: TrainState,
                     kdata, kaug, mesh, K, object_width_mm, mean, std,
                     *, batch_size, resolution, max_trans, max_rot_deg,
                     xyz_range, dr=None, impl="xla"):
    """One FUSED program: render the synthetic (A, B) pair batch AND run
    the train step on it (VERDICT r4 #5: the zero-disk-IO pipeline paid
    3.1x as two sequential programs — sampler then step — with the raw
    f32 batch (~125 MB at batch 200) materialized to HBM and re-read
    between them, plus a second dispatch). Fusing lets XLA keep the
    rendered pair inside one schedule: same RNG streams and numerics as
    ``SyntheticPairs.sample_batch`` + ``train_step`` (``kdata`` drives
    the sampler, ``kaug`` the augmentations — exactly the two keys the
    unfused path uses), so the suite's training recipe is unchanged."""
    from ..data.dataset import _synth_batch_impl

    raw = _synth_batch_impl(mesh, K, kdata, batch_size, resolution,
                            object_width_mm, max_trans, max_rot_deg,
                            xyz_range, dr, impl)
    return train_step_impl(model, tx, cfg, state, kaug, raw, mean, std)


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def eval_step(model, cfg: TrainConfig, state: TrainState, raw_batch, mean,
              std, n_valid=None):
    """Validation loss. ``n_valid`` (traced scalar) masks padded samples:
    the val loader pads its final partial batch up to ``batch_size`` so
    every epoch reuses ONE compiled shape (a fresh shape per epoch-tail
    would otherwise recompile), while the loss stays the exact mean over
    the real samples."""
    bufA, bufB, t_label, r_label = preprocess_batch(
        jax.random.PRNGKey(0), raw_batch, mean, std, cfg, train=False
    )
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        bufA, bufB, train=False,
    )
    sample_weight = None
    if n_valid is not None:
        B = out["trans"].shape[0]
        sample_weight = (jnp.arange(B) < n_valid).astype(jnp.float32)
    total, parts = tracknet.loss_fn(
        out["trans"], out["rot"], t_label, r_label,
        cfg.trans_loss_weight, cfg.rot_loss_weight,
        sample_weight=sample_weight,
    )
    return {"loss": total, "trans": parts["trans"], "rot": parts["rot"]}


def compute_mean_std(
    batches: Iterable[dict], cfg: TrainConfig, max_samples: int = 10000,
    key=None,
) -> tuple[np.ndarray, np.ndarray]:
    """The reference's normalization pass (reference train.py:106-125):
    accumulate per-batch 8-channel means over ~max_samples samples with
    augmentation + OffsetDepth applied; return (mean of batch means,
    std of batch means)."""
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    zero_mean = jnp.zeros(8)
    one_std = jnp.ones(8)
    batch_means = []
    batch_stds = []
    seen = 0
    for raw in batches:
        key, sub = jax.random.split(key)
        bufA, bufB, _, _ = preprocess_batch(
            sub, raw, zero_mean, one_std, cfg, train=True
        )
        stacked = jnp.concatenate([bufA, bufB], axis=-1)  # (N,H,W,8)
        batch_means.append(np.asarray(jnp.mean(stacked, axis=(0, 1, 2))))
        batch_stds.append(np.asarray(jnp.std(stacked, axis=(0, 1, 2))))
        seen += int(stacked.shape[0])
        if seen >= max_samples:
            break
    arr = np.stack(batch_means)
    std = arr.std(axis=0)
    # The reference statistic degenerates when only ONE batch fits in
    # max_samples (std over a single batch mean is 0) or when a channel's
    # batch means are constant — a zero std then NaNs every normalized
    # sample downstream. Fall back to the per-sample std for such
    # channels (floored: a truly constant channel must still divide
    # cleanly). Multi-batch statistics are unchanged.
    fallback = np.maximum(np.stack(batch_stds).mean(axis=0), 1e-3)
    std = np.where(std < 1e-6, fallback, std)
    return arr.mean(axis=0), std


class Trainer:
    """Epoch loop with best-train/best-val checkpoints and resume.

    ``train_batches``/``val_batches`` are callables returning an iterable
    of raw batch dicts for a given (epoch, split) — file-backed
    (data.dataset.PairDataset.batches) or device-synthetic
    (data.dataset.SyntheticPairs).
    """

    def __init__(
        self,
        model: tracknet.Se3TrackNet,
        cfg: TrainConfig,
        outdir: str,
        steps_per_epoch: int,
        mean: np.ndarray,
        std: np.ndarray,
    ):
        self.model = model
        self.cfg = cfg
        self.outdir = outdir
        os.makedirs(outdir, exist_ok=True)
        self.tx, self.schedule = make_optimizer(cfg, steps_per_epoch)
        self.state = create_train_state(
            model, cfg, self.tx, jax.random.PRNGKey(cfg.seed)
        )
        self.mean = jnp.asarray(mean, jnp.float32)
        self.std = jnp.asarray(std, jnp.float32)
        self.best_train = np.inf
        self.best_val = np.inf
        self.key = jax.random.PRNGKey(cfg.seed + 1)
        np.save(os.path.join(outdir, "mean.npy"), np.asarray(mean))
        np.save(os.path.join(outdir, "std.npy"), np.asarray(std))

    # -- persistence -------------------------------------------------------

    def _state_dict(self):
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "epoch": self.state.epoch,
            "mean": np.asarray(self.mean),
            "std": np.asarray(self.std),
            "best_train": np.float32(self.best_train),
            "best_val": np.float32(self.best_val),
        }

    def save(self, name: str, metadata=None):
        ckpt.save_checkpoint(
            os.path.join(self.outdir, name), self._state_dict(), metadata
        )

    def resume(self, path: str):
        """Restore full training state (the capability the reference lacks)."""
        restored = ckpt.load_checkpoint(path, template=self._state_dict())
        self.state = TrainState(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            epoch=restored["epoch"],
        )
        self.best_train = float(restored["best_train"])
        self.best_val = float(restored["best_val"])
        self.mean = jnp.asarray(restored["mean"])
        self.std = jnp.asarray(restored["std"])

    # -- loops -------------------------------------------------------------

    def train_epoch(self, batches, log_every: int = 100,
                    log_fn: Callable = print) -> float:
        metrics = None
        for raw in batches:
            self.key, sub = jax.random.split(self.key)
            self.state, metrics = train_step(
                self.model, self.tx, self.cfg, self.state, sub, raw,
                self.mean, self.std,
            )
            step = int(self.state.step)
            if step % log_every == 0:
                log_fn(
                    f"epoch={int(self.state.epoch)} step={step} "
                    f"loss={float(metrics['loss']):.6f} "
                    f"trans={float(metrics['trans']):.6f} "
                    f"rot={float(metrics['rot']):.6f}"
                )
        return float(metrics["loss"]) if metrics is not None else float("nan")

    def validate(self, batches) -> float:
        """Unweighted mean of per-batch losses (the reference's statistic,
        reference problems.py:106-132). Batches may carry an ``n_valid``
        count (padded final batch, see eval_step)."""
        losses = []
        for raw in batches:
            raw = dict(raw)
            n_valid = raw.pop("n_valid", None)
            if n_valid is not None:
                n_valid = jnp.asarray(n_valid, jnp.int32)
            losses.append(float(
                eval_step(self.model, self.cfg, self.state, raw,
                          self.mean, self.std, n_valid)["loss"]))
        return float(np.mean(losses)) if losses else np.inf

    def loop(self, epochs: int, train_batches, val_batches,
             log_fn: Callable = print, save_all_checkpoints: bool = False):
        """Full training loop with best-train/best-val checkpointing
        (reference problems.py:135-153 artifact protocol);
        ``save_all_checkpoints`` additionally keeps a per-epoch snapshot
        (reference train.py:164)."""
        start = int(self.state.epoch)
        for epoch in range(start, epochs):
            t0 = time.time()
            train_loss = self.train_epoch(train_batches(epoch), log_fn=log_fn)
            val_loss = self.validate(val_batches(epoch))
            self.state = self.state.replace(epoch=self.state.epoch + 1)
            meta = {
                "epoch": epoch, "train_loss": train_loss,
                "val_loss": val_loss, "secs": time.time() - t0,
            }
            if train_loss < self.best_train:
                self.best_train = train_loss
                self.save("model_best_train.msgpack", meta)
            if val_loss < self.best_val:
                self.best_val = val_loss
                self.save("model_best_val.msgpack", meta)
            self.save("checkpoint_last.msgpack", meta)
            if save_all_checkpoints:
                self.save(f"checkpoint_epoch{epoch:04d}.msgpack", meta)
            log_fn(
                f">>> epoch {epoch}: train={train_loss:.6f} "
                f"val={val_loss:.6f} ({meta['secs']:.1f}s)"
            )
