"""Trainer tests: optimizer parity pieces, mean/std quirk, loss descent,
checkpoint resume, and a small learn-to-refine end-to-end check."""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iros20_6d_pose_tracking_tpu.core import se3
from iros20_6d_pose_tracking_tpu.data import augment as A
from iros20_6d_pose_tracking_tpu.data.dataset import SyntheticPairs
from iros20_6d_pose_tracking_tpu.models import tracknet
from iros20_6d_pose_tracking_tpu.render import mesh as M
from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
from iros20_6d_pose_tracking_tpu.train import trainer as tr
from iros20_6d_pose_tracking_tpu.train import checkpoint as ck

RES = 48
K = np.array([[250.0, 0, 24.0], [0, 250.0, 24.0], [0, 0, 1.0]], np.float32)


def _quick_cfg(**kw):
    kw.setdefault("resolution", RES)
    kw.setdefault("batch_size", 8)
    kw.setdefault("aug", A.AugmentConfig(blur_prob=0.0, black_cover_prob=0.0))
    return tr.TrainConfig(**kw)


@pytest.fixture(scope="module")
def synth():
    mesh = rz.upload(M.make_icosphere(subdiv=2, radius=0.05))
    return SyntheticPairs(
        mesh, K, resolution=RES, object_width_mm=110.0,
        xyz_range=((-0.05, 0.05), (-0.05, 0.05), (0.45, 0.65)),
    )


def test_synth_batch_contents(synth):
    raw = synth.sample_batch(jax.random.PRNGKey(0), 4)
    assert raw["rgbA"].shape == (4, RES, RES, 3)
    assert raw["depthB"].shape == (4, RES, RES)
    # Objects visible in both branches.
    assert float(raw["depthA"].max()) > 0 and float(raw["depthB"].max()) > 0
    # Labels from these poses are within normalizers (train assertion,
    # reference datasets.py:152-154).
    t, r = se3.encode_delta(raw["A_in_cam"], raw["B_in_cam"], 0.02,
                            15 * np.pi / 180)
    assert np.abs(np.array(t)).max() <= 1.0 + 1e-4
    assert np.abs(np.array(r)).max() <= 1.0 + 1e-3


def test_synth_batch_dr_composite(synth):
    """On-device DR (dataset.DRComposite): background gets VALID sensor
    depth + texture, occluder blobs z-composite in front, object pixels
    that stay visible are bit-identical to the clean render, and maskB
    becomes true visibility with the producer's >=50%-visible guarantee
    (reference produce_train_pair_data.py:118-128)."""
    from iros20_6d_pose_tracking_tpu.data.dataset import DRComposite

    dr = SyntheticPairs(
        synth.mesh, K, resolution=RES, object_width_mm=110.0,
        xyz_range=synth.xyz_range,
        dr=DRComposite(bg_prob=1.0, occluder_prob=1.0),
    )
    key = jax.random.PRNGKey(3)
    clean = synth.sample_batch(key, 6)
    hard = dr.sample_batch(key, 6)
    # Same poses (DR only touches the B image).
    np.testing.assert_allclose(clean["B_in_cam"], hard["B_in_cam"])
    np.testing.assert_allclose(np.asarray(clean["rgbA"]),
                               np.asarray(hard["rgbA"]))
    obj = np.asarray(clean["depthB"]) > 100.0
    vis = np.asarray(hard["maskB"])
    depth_h = np.asarray(hard["depthB"])
    rgb_h = np.asarray(hard["rgbB"])
    # Background pixels carry valid (non-pinned) depth and texture.
    bg = ~obj & (depth_h > 100.0)
    assert bg.mean() > 0.2, "background depth should be filled"
    # non-object pixels are either true background (>= bg_depth_range lo)
    # or an occluder blob in front of it — all carry VALID depth
    assert (depth_h[bg] > 100.0).all()
    assert (depth_h[bg] >= 850.0 - 1e-3).mean() > 0.5
    assert rgb_h[bg].std() > 5.0, "background should be textured"
    # Visible-object pixels are the clean render, bit-identical.
    np.testing.assert_array_equal(
        np.where(vis[..., None], rgb_h, 0),
        np.where(vis[..., None], np.asarray(clean["rgbB"]), 0))
    np.testing.assert_array_equal(
        np.where(vis, depth_h, 0),
        np.where(vis, np.asarray(clean["depthB"]), 0))
    # maskB is a subset of the object and mostly visible.
    assert (vis <= obj).all()
    per = vis.reshape(6, -1).sum(1) / np.maximum(
        obj.reshape(6, -1).sum(1), 1)
    assert (per >= 0.5 - 1e-6).all(), per
    # Occluders actually fire somewhere in the batch.
    assert (vis.sum() < obj.sum())


@pytest.mark.slow
def test_eval_step_padded_matches_unpadded(synth):
    """Padding the epoch-tail val batch (one compiled shape per epoch)
    must not change the reported loss: eval_step masks padded samples."""
    cfg = _quick_cfg(batch_size=4)
    model = tracknet.Se3TrackNet(image_size=RES)
    tx, _ = tr.make_optimizer(cfg, steps_per_epoch=10)
    state = tr.create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    raw = synth.sample_batch(jax.random.PRNGKey(1), 4)
    small = jax.tree.map(lambda x: x[:3], raw)
    padded = jax.tree.map(
        lambda x: np.concatenate([x[:3], x[:1]], axis=0), raw)

    mean = jnp.zeros(8)
    std = jnp.full(8, 100.0)
    ref = tr.eval_step(model, cfg, state, small, mean, std)
    got = tr.eval_step(model, cfg, state, padded, mean, std,
                       jnp.asarray(3, jnp.int32))
    np.testing.assert_allclose(float(got["loss"]), float(ref["loss"]),
                               rtol=1e-5)
    # Full batch with n_valid == B reproduces the unmasked loss too.
    full = tr.eval_step(model, cfg, state, raw, mean, std,
                        jnp.asarray(4, jnp.int32))
    base = tr.eval_step(model, cfg, state, raw, mean, std)
    np.testing.assert_allclose(float(full["loss"]), float(base["loss"]),
                               rtol=1e-5)


def test_lr_schedule_multistep():
    cfg = _quick_cfg(milestones=(2, 4), gamma=0.1, learning_rate=1e-3)
    _, sched = tr.make_optimizer(cfg, steps_per_epoch=10)
    assert np.isclose(float(sched(0)), 1e-3)
    assert np.isclose(float(sched(25)), 1e-4)
    assert np.isclose(float(sched(45)), 1e-5)


def test_mean_std_single_batch_not_degenerate(synth):
    # With only ONE batch inside max_samples, the reference's
    # std-of-batch-means statistic is identically 0 — which would NaN
    # every normalized sample downstream (train.py:121-122 quirk taken
    # literally). The guard substitutes the per-sample std.
    cfg = _quick_cfg()
    raws = [synth.sample_batch(jax.random.PRNGKey(0), 8)]
    mean, std = tr.compute_mean_std(iter(raws), cfg, max_samples=8)
    assert std.shape == (8,)
    assert (std > 0).all()
    assert np.isfinite(std).all() and np.isfinite(mean).all()


@pytest.mark.slow
def test_mean_std_quirk(synth):
    cfg = _quick_cfg()
    raws = [synth.sample_batch(jax.random.PRNGKey(i), 8) for i in range(3)]
    mean, std = tr.compute_mean_std(iter(raws), cfg, max_samples=24)
    assert mean.shape == (8,) and std.shape == (8,)
    # std here is the std across batch MEANS (train.py:121-122): small.
    assert (std < 60).all()
    assert mean[:3].mean() > 1.0  # rgb channels have mass


@pytest.mark.slow
def test_loss_decreases_and_resume(tmp_path, synth):
    cfg = _quick_cfg(learning_rate=3e-4)
    model = tracknet.Se3TrackNet(image_size=RES)
    trainer = tr.Trainer(model, cfg, str(tmp_path), steps_per_epoch=10,
                         mean=np.zeros(8), std=np.full(8, 100.0))

    key = jax.random.PRNGKey(42)
    losses = []
    for i in range(12):
        raw = synth.sample_batch(jax.random.fold_in(key, i), cfg.batch_size)
        trainer.key, sub = jax.random.split(trainer.key)
        trainer.state, m = tr.train_step(
            model, trainer.tx, cfg, trainer.state, sub, raw,
            trainer.mean, trainer.std,
        )
        losses.append(float(m["loss"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])

    # Save, perturb, resume -> next step must be identical.
    trainer.save("checkpoint_last.msgpack")
    raw = synth.sample_batch(jax.random.PRNGKey(999), cfg.batch_size)
    key_step = jax.random.PRNGKey(7)
    s1, m1 = tr.train_step(model, trainer.tx, cfg, trainer.state, key_step,
                           raw, trainer.mean, trainer.std)

    trainer2 = tr.Trainer(model, cfg, str(tmp_path / "b"), steps_per_epoch=10,
                          mean=np.zeros(8), std=np.full(8, 100.0))
    trainer2.resume(str(tmp_path / "checkpoint_last.msgpack"))
    s2, m2 = tr.train_step(model, trainer2.tx, cfg, trainer2.state, key_step,
                           raw, trainer2.mean, trainer2.std)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.array(a), np.array(b),
                                                atol=1e-6),
        s1.params, s2.params,
    )


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.int32(7)}
    path = str(tmp_path / "x.msgpack")
    ck.save_checkpoint(path, state, {"note": "hi"})
    restored = ck.load_checkpoint(path)
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    assert restored["step"] == 7
    assert ck.load_metadata(path)["note"] == "hi"


@pytest.mark.slow
def test_learns_to_refine(synth):
    """~150 steps on device-synthetic pairs must beat the no-op baseline:
    the predicted update moves the pose closer to ground truth.

    The forward pass uses CURRENT-BATCH BatchNorm statistics (train=True,
    mutations discarded), NOT the running averages: at 150 tiny-batch
    steps the running stats are still warming up and dominate the
    prediction error — measured ratios through running stats swung
    0.64 -> 1.05 between 150 and 220 steps (pure BN-warmup noise, flips
    with platform reduction order), while batch-stats eval gives a stable
    0.38 at 150 steps. Full training converges the running stats; the
    trajectory-level tests cover that path."""
    cfg = _quick_cfg(learning_rate=1e-3)
    model = tracknet.Se3TrackNet(image_size=RES)
    tx, _ = tr.make_optimizer(cfg, steps_per_epoch=1000)
    state = tr.create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    mean = jnp.zeros(8)
    std = jnp.full(8, 100.0)

    key = jax.random.PRNGKey(1)
    for i in range(150):
        raw = synth.sample_batch(jax.random.fold_in(key, i), cfg.batch_size)
        state, m = tr.train_step(model, tx, cfg, state, jax.random.fold_in(key, 10_000 + i),
                                 raw, mean, std)

    # Evaluate refinement quality on fresh pairs.
    raw = synth.sample_batch(jax.random.PRNGKey(123), 32)
    bufA, bufB, t_label, r_label = tr.preprocess_batch(
        jax.random.PRNGKey(5), raw, mean, std, cfg, train=False
    )
    out, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        bufA, bufB, train=True, mutable=["batch_stats"],
    )
    pred_B = se3.decode_delta(
        jnp.asarray(raw["A_in_cam"]), out["trans"], out["rot"],
        cfg.trans_normalizer, cfg.rot_normalizer,
    )
    gt_t = np.array(raw["B_in_cam"])[:, :3, 3]
    err_before = np.linalg.norm(np.array(raw["A_in_cam"])[:, :3, 3] - gt_t, axis=1)
    err_after = np.linalg.norm(np.array(pred_B)[:, :3, 3] - gt_t, axis=1)
    # measured 0.38 on a 1-core host; 0.60 leaves margin for platform
    # reduction-order drift without hiding a real training regression
    assert err_after.mean() < 0.60 * err_before.mean(), (
        err_before.mean(), err_after.mean())


def test_bf16_train_step_descends_with_f32_state(synth):
    """--bf16 training (bf16 activations, f32 params/Adam state): loss
    descends, params/batch_stats stay f32 (the mixed-precision contract
    apps/train.py:147-149 relies on), and metrics are finite."""
    import jax.numpy as jnp

    cfg = _quick_cfg(learning_rate=3e-4)
    model = tracknet.Se3TrackNet(image_size=RES, dtype=jnp.bfloat16)
    tx, _ = tr.make_optimizer(cfg, steps_per_epoch=10)
    state = tr.create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(state.params))

    key = jax.random.PRNGKey(11)
    losses = []
    for i in range(12):
        raw = synth.sample_batch(jax.random.fold_in(key, i), cfg.batch_size)
        state, m = tr.train_step(model, tx, cfg, state,
                                 jax.random.fold_in(key, 10**6 + i), raw,
                                 np.zeros(8), np.full(8, 100.0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(state.params))
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(state.batch_stats))
