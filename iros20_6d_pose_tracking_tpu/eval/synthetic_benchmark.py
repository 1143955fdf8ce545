"""Closed-loop synthetic accuracy benchmark.

The reference's accuracy evidence is the YCB-Video / YCBInEOAT tables
(reference eval_ycb.py / eval_ycbineoat.py; README.md:53,89). That data
cannot be fetched in this environment, so this module is the framework's
self-contained accuracy harness: for each object it runs the FULL loop —
on-device DR pair synthesis -> training -> tracking a rendered test video
(optionally "hard": textured valid-depth background, a sweeping partial
occluder, depth dropout) -> ADD / ADD-S AUC under the reference's VOCap
protocol (eval/metrics.py, reference eval_ycb.py:45-64).

Used by examples/demo_train_and_track.py (single object, CLI) and
benchmarks/accuracy_suite.py (multi-object table).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..core import se3
from ..data import augment as A
from ..data.dataset import DRComposite, SyntheticPairs, ensemble_synth_batch
from ..models import tracknet
from ..render import mesh as M
from ..render import rasterizer as rz
from ..tracking import tracker as trk
from ..train import trainer as tr
from . import metrics as ME

# YCB-Video camera intrinsics (reference dataset_info.yml camera block).
YCB_K = np.array(
    [[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]],
    np.float32,
)

OBJECTS = {
    # face-colored cube: rotation observable in RGB and depth
    "cube": lambda: M.make_cube(0.08),
    # anisotropic box: distinct extents break rotational ambiguity
    "box": lambda: M.make_box((0.10, 0.06, 0.035)),
    # asymmetric L-bracket: thin arms, self-occlusion at grazing views
    "lshape": lambda: M.make_lshape(),
    # faceted icosahedron: near-round geometry, rotation mostly RGB-borne
    "icosahedron": lambda: M.make_icosphere(subdiv=1, radius=0.05),
    # uniform cylinder: axial rotation unobservable -> ADD ill-posed,
    # ADD-S meaningful (the reference's bowl/cans regime,
    # reference eval_ycb.py:102-118 ADD vs ADI split)
    "cylinder": lambda: M.make_cylinder(),
    # uniform sphere: EVERY rotation unobservable; translation-only
    "sphere": lambda: M.make_plain_sphere(),
    # thin plate: near-degenerate depth extent + 180-degree flip
    # ambiguity face-on — a documented failure geometry
    "plate": lambda: M.make_plate(),
    # UV-textured box: sub-face texture detail through the full loop
    # (train on textured renders -> track a textured video) — the
    # synthetic stand-in for YCB textured.obj
    "textured_box": lambda: M.make_textured_box(),
}

# objects whose geometry leaves rotations unobservable: score them by
# ADD-S; their ADD column is reported for honesty, not as a target
SYMMETRIC_OBJECTS = frozenset({"cylinder", "sphere", "plate"})


def default_impl() -> str:
    """Same renderer auto-selection as the production Tracker."""
    return trk.default_render_impl()


def _print_flush(*a):
    """Default progress logger: line-buffered even when stdout is a pipe
    (a suite run is hours; block-buffered print looks hung under tee)."""
    print(*a, flush=True)


@dataclass
class BenchObject:
    """One trained tracker + its assets."""

    name: str
    tm: M.TriMesh
    mesh: rz.MeshArrays
    model: tracknet.Se3TrackNet
    variables: dict
    mean: jnp.ndarray
    std: jnp.ndarray
    width_mm: float
    tcfg: trk.TrackerConfig
    train_secs: float = 0.0
    losses: list = field(default_factory=list)


def _recipe_fingerprint(dr, aug, impl) -> str:
    """Hash of the training-recipe knobs NOT already in the checkpoint
    metadata: dr on/off + its fields, every AugmentConfig field, and the
    renderer impl. A rerun with a different recipe (e.g. --clean vs
    hard) against the same ckpt_dir must be REJECTED, not silently
    resumed from weights trained under the other regime (ADVICE r4).
    Both config objects are plain dataclasses of scalars, so repr() is a
    stable description."""
    import hashlib

    desc = repr((repr(dr) if dr is not None else None, repr(aug), impl))
    return hashlib.sha1(desc.encode()).hexdigest()[:12]


def train_object(
    tm: M.TriMesh,
    K=YCB_K,
    *,
    name: str = "object",
    steps: int = 10_000,
    batch: int = 32,
    res: int = 176,
    dr: DRComposite | None = None,
    aug: A.AugmentConfig | None = None,
    impl: str | None = None,
    seed_offset: int = 0,
    log=_print_flush,
    ckpt_dir: str | None = None,
    ckpt_every: int = 1000,
) -> BenchObject:
    """Train Se3TrackNet on on-device synthetic pairs for one object.

    Mirrors the reference recipe (train.py:85-165): pose-perturbation
    pairs, photometric augmentation, mean/std pass, Adam. ``dr`` adds the
    on-device scene randomization (data/dataset.py::DRComposite) that
    stands in for the Blender DR stage.

    ``ckpt_dir``: periodic full-state checkpointing every ``ckpt_every``
    steps to ``<ckpt_dir>/<name>_last.msgpack`` — an interrupted run
    resumes from the last save (same mechanism as
    :func:`train_objects_ensemble`: RNG streams are keyed by the
    absolute step index, so the resumed run consumes the same batch
    sequence)."""
    impl = impl or default_impl()
    mesh = rz.upload(tm)
    width = tm.diameter * 1000 * 1.1
    cfg = tr.TrainConfig(
        resolution=res, batch_size=batch, learning_rate=1e-3,
        trans_normalizer=0.02, rot_normalizer=15 * np.pi / 180,
        aug=aug if aug is not None else A.AugmentConfig(),
    )
    recipe = _recipe_fingerprint(dr, cfg.aug, impl)
    synth = SyntheticPairs(
        mesh, K, resolution=res, object_width_mm=width,
        max_trans=0.02, max_rot_deg=15.0,
        xyz_range=((-0.12, 0.12), (-0.09, 0.09), (0.45, 0.85)),
        dr=dr,
    )
    ckpt_path = None
    restored = None
    if ckpt_dir:
        import os as _os

        from ..train import checkpoint as ck

        _os.makedirs(ckpt_dir, exist_ok=True)
        ckpt_path = _os.path.join(ckpt_dir, f"{name}_last.msgpack")
        if _os.path.exists(ckpt_path):
            meta = ck.load_metadata(ckpt_path)
            if (meta.get("name") == name
                    and int(meta.get("total_steps", -1)) == steps
                    and int(meta.get("batch", -1)) == batch
                    and int(meta.get("res", -1)) == res
                    and meta.get("recipe") == recipe):
                restored = ck.load_checkpoint(ckpt_path)
            else:
                log(f"[{name}] ignoring {ckpt_path}: different "
                    "name/steps/batch/res/recipe")

    if restored is not None:
        mean_j = jnp.asarray(restored["mean"], jnp.float32)
        std_j = jnp.asarray(restored["std"], jnp.float32)
    else:
        mean, std = tr.compute_mean_std(
            (synth.sample_batch(jax.random.PRNGKey(900 + seed_offset + i),
                                batch)
             for i in range(4)),
            cfg, max_samples=4 * batch,
        )
        mean_j = jnp.asarray(mean, jnp.float32)
        std_j = jnp.asarray(std, jnp.float32)
    model = tracknet.Se3TrackNet(image_size=res)
    tx, _ = tr.make_optimizer(cfg, steps_per_epoch=10_000)
    state = tr.create_train_state(model, cfg, tx,
                                  jax.random.PRNGKey(seed_offset))
    start_step = 0
    if restored is not None:
        from flax import serialization as _ser

        from ..train import checkpoint as ck

        state = _ser.from_state_dict(state, restored["state"])
        start_step = int(ck.load_metadata(ckpt_path)["step"]) + 1
        log(f"[{name}] resumed from {ckpt_path} at step {start_step}")

    def save_ckpt(i):
        if ckpt_path is None:
            return
        from ..train import checkpoint as ck

        ck.save_checkpoint(
            ckpt_path, {"state": state, "mean": mean_j, "std": std_j},
            metadata={"name": name, "step": int(i),
                      "total_steps": int(steps), "batch": int(batch),
                      "res": int(res), "recipe": recipe},
        )

    key = jax.random.PRNGKey(7 + seed_offset)
    losses = []
    t0 = time.time()
    for i in range(start_step, steps):
        raw = synth.sample_batch(jax.random.fold_in(key, i), batch)
        state, m = tr.train_step(model, tx, cfg, state,
                                 jax.random.fold_in(key, 10**6 + i), raw,
                                 mean_j, std_j)
        if i % 100 == 0 or i == steps - 1:
            loss = float(m["loss"])
            losses.append(loss)
            log(f"[{name}] step {i}: loss={loss:.5f} "
                f"trans={float(m['trans']):.5f} rot={float(m['rot']):.5f} "
                f"({time.time() - t0:.0f}s)")
        if ckpt_path and i and (i % ckpt_every == 0 or i == steps - 1):
            save_ckpt(i)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    tcfg = trk.TrackerConfig(
        resolution=res, trans_normalizer=0.02,
        rot_normalizer=15 * np.pi / 180, object_width_mm=width,
        render_impl=impl,
    )
    return BenchObject(
        name=name, tm=tm, mesh=mesh, model=model, variables=variables,
        mean=mean_j, std=std_j, width_mm=width, tcfg=tcfg,
        train_secs=time.time() - t0, losses=losses,
    )


def train_objects_ensemble(
    names,
    K=YCB_K,
    *,
    steps: int = 5_000,
    batch: int = 200,
    res: int = 176,
    dr: DRComposite | None = None,
    aug: A.AugmentConfig | None = None,
    impl: str | None = None,
    log=_print_flush,
    ckpt_dir: str | None = None,
    ckpt_every: int = 1000,
) -> list[BenchObject]:
    """Train ALL objects simultaneously as an object ensemble — one
    program per step renders every object's DR pairs and applies every
    object's Adam update (parallel/spmd.ensemble_train_step +
    data/dataset.ensemble_synth_batch). On one chip the objects run
    serially inside the program (lax.map — per-object throughput parity
    with sequential runs; the wins are ONE compile, ONE stats pass, and
    a single resumable run); on a multi-chip ('obj','dp') mesh the vmap
    path shards objects across devices for true object-parallelism.

    Per-object normalization statistics, widths, and meshes; everything
    else (recipe, seeds) matches :func:`train_object` semantics. Returns
    BenchObjects compatible with evaluate_tracking.

    ``ckpt_dir``: periodic full-state checkpointing every ``ckpt_every``
    steps (params, batch_stats, Adam state, per-object stats). A multi-
    hour ensemble run interrupted at step k resumes from the last
    multiple of ``ckpt_every`` instead of restarting — call again with
    the same names/steps/ckpt_dir. (RNG streams are keyed by the
    absolute step index, so a resumed run consumes the same batch
    sequence it would have seen uninterrupted; loss-history entries
    before the resume point are not replayed.)"""
    from ..parallel import spmd

    impl = impl or default_impl()
    tms = [OBJECTS[n]() if isinstance(n, str) else n for n in names]
    names = [n if isinstance(n, str) else f"obj{i}"
             for i, n in enumerate(names)]
    O = len(tms)
    ens_mesh = spmd.stack_meshes(tms)
    widths = jnp.asarray([tm.diameter * 1000 * 1.1 for tm in tms],
                         jnp.float32)
    cfg = tr.TrainConfig(
        resolution=res, batch_size=batch, learning_rate=1e-3,
        trans_normalizer=0.02, rot_normalizer=15 * np.pi / 180,
        aug=aug if aug is not None else A.AugmentConfig(),
    )
    xyz_range = ((-0.12, 0.12), (-0.09, 0.09), (0.45, 0.85))
    Kj = jnp.asarray(K, jnp.float32)
    recipe = _recipe_fingerprint(dr, cfg.aug, impl)

    def sample(key, n):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(O))
        return ensemble_synth_batch(
            ens_mesh, Kj, keys, widths, n, res, 0.02, 15.0, xyz_range, dr)

    ckpt_path = None
    restored = None
    if ckpt_dir:
        import os as _os

        from ..train import checkpoint as ck

        ckpt_path = _os.path.join(ckpt_dir, "ensemble_last.msgpack")
        if _os.path.exists(ckpt_path):
            meta = ck.load_metadata(ckpt_path)
            if (meta.get("names") == list(names)
                    and int(meta.get("total_steps", -1)) == steps
                    and meta.get("recipe") == recipe):
                restored = ck.load_checkpoint(ckpt_path)
            else:
                log(f"[ensemble x{O}] ignoring {ckpt_path}: different "
                    "names/steps/recipe")

    if restored is not None:
        mean = jnp.asarray(restored["mean"], jnp.float32)
        std = jnp.asarray(restored["std"], jnp.float32)
    else:
        # per-object mean/std: the reference's "std of batch means"
        # statistic (train.py:106-125), computed per ensemble slice
        batch_means = []
        for i in range(4):
            raw = sample(jax.random.PRNGKey(900 + i), batch)
            ms = []
            for o in range(O):
                one = jax.tree.map(lambda x: x[o], raw)
                bufA, bufB, _, _ = tr.preprocess_batch(
                    jax.random.fold_in(jax.random.PRNGKey(i), o), one,
                    jnp.zeros(8), jnp.ones(8), cfg, train=True)
                ms.append(np.asarray(
                    jnp.concatenate([bufA, bufB], -1).mean(axis=(0, 1, 2))))
            batch_means.append(np.stack(ms))
        arr = np.stack(batch_means)                      # (4, O, 8)
        mean = jnp.asarray(arr.mean(axis=0), jnp.float32)  # (O, 8)
        std = jnp.asarray(arr.std(axis=0), jnp.float32)

    model = tracknet.Se3TrackNet(image_size=res)
    tx, _ = tr.make_optimizer(cfg, steps_per_epoch=10_000)
    states = [tr.create_train_state(model, cfg, tx, jax.random.PRNGKey(i))
              for i in range(O)]
    ens_state = spmd.stack_states(states)
    start_step = 0
    if restored is not None:
        from flax import serialization as _ser

        ens_state = _ser.from_state_dict(ens_state, restored["state"])
        start_step = int(ck.load_metadata(ckpt_path)["step"]) + 1
        log(f"[ensemble x{O}] resumed from {ckpt_path} at step "
            f"{start_step}")
    mesh1 = spmd.make_mesh(1, obj=1)
    step = spmd.ensemble_train_step(model, tx, cfg, mesh1,
                                    per_object_stats=True)

    def save_ckpt(i):
        if ckpt_path is None:
            return
        from ..train import checkpoint as ck

        ck.save_checkpoint(
            ckpt_path,
            {"state": ens_state, "mean": mean, "std": std},
            metadata={"names": list(names), "step": int(i),
                      "total_steps": int(steps), "batch": int(batch),
                      "res": int(res), "recipe": recipe},
        )

    key = jax.random.PRNGKey(7)
    losses = {n: [] for n in names}
    t0 = time.time()
    with mesh1:
        for i in range(start_step, steps):
            raw = sample(jax.random.fold_in(key, i), batch)
            step_keys = jax.vmap(
                lambda o: jax.random.fold_in(
                    jax.random.fold_in(key, 10**6 + i), o)
            )(jnp.arange(O))
            ens_state, m = step(ens_state, step_keys, raw, mean, std)
            if i % 100 == 0 or i == steps - 1:
                lv = np.asarray(m["loss"])
                for o, n in enumerate(names):
                    losses[n].append(float(lv[o]))
                log(f"[ensemble x{O}] step {i}: " + " ".join(
                    f"{n}={lv[o]:.5f}" for o, n in enumerate(names))
                    + f" ({time.time() - t0:.0f}s)")
            if ckpt_path and i and (i % ckpt_every == 0 or i == steps - 1):
                save_ckpt(i)
    train_secs = time.time() - t0

    objs = []
    for o, (n, tm) in enumerate(zip(names, tms)):
        variables = {
            "params": jax.tree.map(lambda x: x[o], ens_state.params),
            "batch_stats": jax.tree.map(lambda x: x[o],
                                        ens_state.batch_stats),
        }
        w = float(widths[o])
        tcfg = trk.TrackerConfig(
            resolution=res, trans_normalizer=0.02,
            rot_normalizer=15 * np.pi / 180, object_width_mm=w,
            render_impl=impl,
        )
        objs.append(BenchObject(
            name=n, tm=tm, mesh=rz.upload(tm), model=model,
            variables=variables, mean=mean[o], std=std[o], width_mm=w,
            tcfg=tcfg, train_secs=train_secs / O, losses=losses[n],
        ))
    return objs


def make_gt_trajectory(T: int, seed: int = 5,
                       z0: float = 0.6) -> np.ndarray:
    """(T, 4, 4) smooth random-walk camera-frame trajectory: 6 deg/frame
    rotation, ~4 mm/frame translation with gentle direction changes —
    the motion regime the 0.02 m / 15 deg normalizers cover."""
    rng = np.random.RandomState(seed)
    gt = [np.eye(4, dtype=np.float32)]
    gt[0][:3, 3] = [0.0, 0.0, z0]
    w_vel = rng.randn(3)
    w_vel = w_vel / np.linalg.norm(w_vel) * np.deg2rad(6.0)
    t_vel = np.array([0.004, -0.003, 0.005])
    for i in range(1, T):
        prev = gt[-1]
        cur = prev.copy()
        cur[:3, :3] = np.asarray(
            se3.so3_exp(jnp.asarray(w_vel, jnp.float32))) @ prev[:3, :3]
        if i % 15 == 0:
            w_vel = rng.randn(3)
            w_vel = w_vel / np.linalg.norm(w_vel) * np.deg2rad(6.0)
            t_vel = rng.randn(3) * 0.004
        cur[:3, 3] = prev[:3, 3] + t_vel
        # keep the object inside the camera frustum — long-horizon runs
        # (500+ frames) would otherwise random-walk out of frame
        cur[0, 3] = np.clip(cur[0, 3], -0.12, 0.12)
        cur[1, 3] = np.clip(cur[1, 3], -0.09, 0.09)
        cur[2, 3] = np.clip(cur[2, 3], 0.45, 0.9)
        gt.append(cur)
    return np.stack(gt)


def render_test_video(
    mesh: rz.MeshArrays,
    gt: np.ndarray,
    K=YCB_K,
    *,
    hw=(480, 640),
    hard: bool = False,
    impl: str | None = None,
    bg_seed: int = 11,
    background: bool | None = None,
    occluder: bool | None = None,
    dropout: bool | None = None,
    lighting=None,
):
    """Render the observed RGB-D video for a gt trajectory.

    ``hard`` builds the robustness scene: fixed textured background at
    VALID sensor depth, an occluder sphere sweeping past (grazing the
    object's edge — partial occlusion, the regime the DR training
    composites cover), and per-frame depth dropout. The three factors
    can also be toggled individually (for ablations).

    ``lighting``: optional (5,) [ambient, diffuse, lx, ly, lz] override
    for the OBSERVED render — the domain-shifted evaluation
    (eval/domain_shift.py) uses it to break renderer identity with the
    tracker's A branch, which keeps the rasterizer defaults."""
    background = hard if background is None else background
    occluder = hard if occluder is None else occluder
    dropout = hard if dropout is None else dropout
    hard = background or occluder or dropout
    impl = impl or default_impl()
    H, W = hw
    T = len(gt)
    window = rz.full_frame_window(W, H)
    Kj = jnp.asarray(K)

    def render_frame(pose):
        return rz.render(mesh, jnp.asarray(pose), Kj, window, out_hw=hw,
                         impl=impl, lighting=lighting)

    if not hard:
        frames = [render_frame(gt[i]) for i in range(T)]
        return (jnp.stack([f[0] for f in frames]),
                jnp.stack([f[1] for f in frames]))

    from ..datagen.pair_producer import _procedural_texture

    occ = rz.upload(M.make_icosphere(subdiv=2, radius=0.018))
    bg_rgb = jnp.asarray(
        _procedural_texture(np.random.RandomState(bg_seed), H, W),
        jnp.float32)
    bg_depth = 1500.0

    def render_hard(pose, i):
        r_obj, d_obj = render_frame(pose)
        do = jnp.where(d_obj > 0, d_obj, jnp.inf)
        rgb, depth = r_obj, do
        if occluder:
            # occluder sweeps laterally, grazing the object's lower edge
            # — partial (<~50%) occlusion (reference BlackCover keeps
            # >=50% visible, data_augmentation.py:217-267)
            phase = 2 * np.pi * i / 40.0
            t_obj = pose[:3, 3]
            occ_pose = np.eye(4, dtype=np.float32)
            occ_pose[:3, 3] = t_obj * 0.62 + np.array(
                [0.055 * np.cos(phase), 0.030 + 0.004 * np.sin(2 * phase),
                 0.0], np.float32)
            r_occ, d_occ = rz.render(occ, jnp.asarray(occ_pose), Kj,
                                     window, out_hw=hw, impl=impl,
                                     lighting=lighting)
            dc = jnp.where(d_occ > 0, d_occ, jnp.inf)
            occ_wins = dc < do
            rgb = jnp.where(occ_wins[..., None], r_occ, r_obj)
            depth = jnp.minimum(do, dc)
        hit = jnp.isfinite(depth)
        if background:
            rgb = jnp.where(hit[..., None], rgb, bg_rgb)
            depth = jnp.where(hit, depth, bg_depth)
        else:
            rgb = jnp.where(hit[..., None], rgb, 0.0)
            depth = jnp.where(hit, depth, 0.0)
        if dropout:
            drop = jax.random.bernoulli(
                jax.random.PRNGKey(1000 + i), 0.03, depth.shape)
            depth = jnp.where(drop, 0.0, depth)
        return rgb, depth

    frames = [render_hard(gt[i], i) for i in range(T)]
    return (jnp.stack([f[0] for f in frames]),
            jnp.stack([f[1] for f in frames]))


def _score_poses(obj: BenchObject, gt: np.ndarray,
                 poses: np.ndarray) -> dict:
    """ADD / ADD-S per frame + VOCap AUC for a (T,4,4) estimate
    trajectory, with the hold-init drift baseline for context."""
    cloud = M.voxel_down_sample(obj.tm.verts, 0.005)
    add, adi = ME.batch_errors(poses, gt, cloud)
    base_add, _ = ME.batch_errors(np.tile(gt[:1], (len(gt), 1, 1)), gt,
                                  cloud)
    return {
        "name": obj.name,
        "poses": poses,
        "add": add,
        "adi": adi,
        "add_auc": float(ME.vocap(add) * 100),
        "adi_auc": float(ME.vocap(adi) * 100),
        "add_mean_mm": float(add.mean() * 1000),
        "add_max_mm": float(add.max() * 1000),
        "final_trans_err_mm": float(
            np.linalg.norm(poses[-1][:3, 3] - gt[-1][:3, 3]) * 1000),
        "baseline_add_mean_mm": float(base_add.mean() * 1000),
        "baseline_add_auc": float(ME.vocap(base_add) * 100),
    }


def _quantize(rgb, dep):
    """Observed video at sensor precision (uint8 RGB / uint16 mm depth).
    EVERY accuracy-table row scores a quantized observed video — the
    ensemble fast path, the sequential/textured path, and the severity
    sweep alike — so rows are apples-to-apples across paths and reruns
    (ADVICE r4: the sequential path used to score unquantized float
    renders)."""
    rgb = np.asarray(jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8))
    dep = np.asarray(jnp.clip(jnp.round(dep), 0, 65535).astype(jnp.uint16))
    return rgb, dep


def evaluate_tracking(obj: BenchObject, gt: np.ndarray, frames_rgb,
                      frames_depth, K=YCB_K, init_pose=None) -> dict:
    """Track from ``init_pose`` (default gt[0] — pass a perturbed pose
    for PoseCNN-grade noisy initialization) and score ADD / ADD-S per
    frame + VOCap AUC, with the hold-init drift baseline for context."""
    if init_pose is None:
        init_pose = gt[0]
    poses = trk.track_video(
        obj.model, obj.tcfg, obj.variables, obj.mesh, jnp.asarray(K),
        obj.mean, obj.std, jnp.asarray(init_pose, jnp.float32),
        frames_rgb[1:], frames_depth[1:],
    )
    poses = np.concatenate([gt[:1], np.asarray(poses)], axis=0)
    return _score_poses(obj, gt, poses)


def ensemble_evaluate_tracking(objs, gt: np.ndarray, stacked_rgb,
                               stacked_depth, K=YCB_K,
                               init_poses=None) -> list[dict]:
    """Track EVERY object's test video in one SPMD program and score
    each with the :func:`evaluate_tracking` protocol.

    One compile covers the whole ensemble (the per-object meshes are
    padded to a single face count by parallel/spmd.stack_meshes, so all
    per-object shapes are identical) — on this environment's remote
    compile service that replaces O track_video compiles (tens of
    seconds each) with one. On a single chip the objects run serially
    inside the program (lax.map — per-object throughput parity); a
    multi-chip ('obj','dp') mesh runs them in parallel (VERDICT r3 #6:
    SURVEY §2 "one object per core is the natural parallelism").

    ``stacked_rgb``/``stacked_depth``: (O, T, H, W[,3]) arrays — pass
    uint8/uint16 to quarter the HBM residency of a long suite video.
    ``init_poses``: (O, 4, 4) (default: gt[0] for every object).
    """
    from ..parallel import spmd

    O = len(objs)
    ens_vars = jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[o.variables for o in objs])
    ens_meshes = spmd.stack_meshes([o.tm for o in objs])
    mean = jnp.stack([o.mean for o in objs])
    std = jnp.stack([o.std for o in objs])
    widths = jnp.asarray([o.width_mm for o in objs], jnp.float32)
    if init_poses is None:
        init_poses = np.tile(gt[:1], (O, 1, 1))
    mesh1 = spmd.make_mesh(1, obj=1)
    run = spmd.multi_object_track_videos(objs[0].model, objs[0].tcfg,
                                         mesh1, per_object_stats=True)
    with mesh1:
        poses = run(ens_vars, ens_meshes, jnp.asarray(K), mean, std,
                    jnp.asarray(init_poses, jnp.float32),
                    jnp.asarray(np.asarray(stacked_rgb)[:, 1:]),
                    jnp.asarray(np.asarray(stacked_depth)[:, 1:]), widths)
    poses = np.asarray(poses)
    out = []
    for o, obj in enumerate(objs):
        full = np.concatenate([gt[:1], poses[o]], axis=0)
        out.append(_score_poses(obj, gt, full))
    return out


def shift_severity_sweep(obj: BenchObject, gt: np.ndarray, *,
                         hard: bool = True, impl: str | None = None,
                         severities=(0.5, 1.0, 2.0, 4.0),
                         sensor=None, seed: int = 0, K=YCB_K,
                         hw=(480, 640), log=_print_flush) -> list[dict]:
    """AUC-vs-severity curve: evaluate the tracker under the sensor
    model scaled to each severity (domain_shift.SensorModel.scaled — at
    s the lighting constants move s of the way from the rasterizer
    defaults, noise/blur/quantization/init-error scale by s). A single
    mild operating point is not a robustness margin; this sweep shows
    where degradation begins (VERDICT r3 #3). Each severity re-renders
    the observed video (the lighting shift changes with s) and re-draws
    a noisy init of the scaled magnitude.

    Textured objects get one extra row, ``"tex_hostile"``: a strong
    fixed color cast + doubled AWB hunting at base severity
    (domain_shift.texture_hostile) — the shift that attacks the UV
    appearance cue specifically."""
    from . import domain_shift as DS

    base = sensor if sensor is not None else DS.SensorModel()
    points = [(float(s), base.scaled(float(s))) for s in severities]
    if obj.tm.texture is not None:
        points.append(("tex_hostile", DS.texture_hostile(base)))
    rows = []
    for tag, sm in points:
        rgb, dep = render_test_video(obj.mesh, gt, K=K, hw=hw, hard=hard,
                                     impl=impl, lighting=sm.lighting())
        sd = seed + (int(tag * 100) if isinstance(tag, float) else 9999)
        rgb_s, dep_s = DS.shift_video(rgb, dep, gt, K, sm, seed=2000 + sd)
        rgb_s, dep_s = _quantize(rgb_s, dep_s)
        init = DS.noisy_init_pose(jax.random.PRNGKey(700 + sd), gt[0], sm)
        r = evaluate_tracking(obj, gt, rgb_s, dep_s, K=K, init_pose=init)
        rows.append({
            "severity": tag,
            "add_auc": r["add_auc"],
            "adi_auc": r["adi_auc"],
            "add_mean_mm": r["add_mean_mm"],
            "final_trans_err_mm": r["final_trans_err_mm"],
        })
        log(f"[{obj.name}] shift x{tag}: ADD AUC {r['add_auc']:.2f} "
            f"ADD-S {r['adi_auc']:.2f} mean {r['add_mean_mm']:.1f}mm")
    return rows


SHIFT_AXES = {
    "lighting": ("ambient", "diffuse", "light_cam"),
    "photometric": ("exposure_amp", "wb_amp", "gamma", "rgb_noise_std",
                    "wb_const"),
    "blur": ("motion_blur_px",),
    "depth": ("depth_quant_mm", "edge_dropout_prob", "depth_warp_amp",
              "depth_noise_mm", "dropout_prob"),
    "init": ("init_trans_m", "init_rot_deg"),
}


def shift_axis_ablation(obj: BenchObject, gt: np.ndarray, *,
                        severity: float = 2.0, hard: bool = True,
                        impl: str | None = None, sensor=None,
                        seed: int = 0, K=YCB_K, hw=(480, 640),
                        log=_print_flush) -> list[dict]:
    """WHICH shift axis kills tracking at a given severity (VERDICT r4
    #3: textured_box collapses a full octave before geometry objects at
    x2 and nothing names the killing axis). Evaluates the tracker under
    single-axis sensor models: every field at its nominal (severity-0)
    value except ONE axis group at the full-severity value — plus
    'none' (all nominal) and 'full' (everything at severity) anchors.
    The axis whose solo row approaches the full row's damage is the
    dominant failure mode."""
    import dataclasses

    from . import domain_shift as DS

    base = sensor if sensor is not None else DS.SensorModel()
    full = base.scaled(float(severity))
    nominal = base.scaled(0.0)
    axes = ([("none", ())] +
            [(n, f) for n, f in SHIFT_AXES.items()] +
            [("full", tuple(x for f in SHIFT_AXES.values() for x in f))])
    render_cache = {}
    rows = []
    for name, fields in axes:
        sm = dataclasses.replace(
            nominal, **{f: getattr(full, f) for f in fields})
        lkey = tuple(np.asarray(sm.lighting()).tolist())
        if lkey not in render_cache:  # only lighting changes the render
            render_cache[lkey] = render_test_video(
                obj.mesh, gt, K=K, hw=hw, hard=hard, impl=impl,
                lighting=sm.lighting())
        rgb, dep = render_cache[lkey]
        rgb_s, dep_s = DS.shift_video(rgb, dep, gt, K, sm,
                                      seed=3000 + seed)
        rgb_s, dep_s = _quantize(rgb_s, dep_s)
        init = DS.noisy_init_pose(jax.random.PRNGKey(800 + seed), gt[0],
                                  sm)
        r = evaluate_tracking(obj, gt, rgb_s, dep_s, K=K, init_pose=init)
        rows.append({
            "axis": name,
            "severity": float(severity),
            "add_auc": r["add_auc"],
            "adi_auc": r["adi_auc"],
            "add_mean_mm": r["add_mean_mm"],
        })
        log(f"[{obj.name}] shift-ablation x{severity} {name}: "
            f"ADD AUC {r['add_auc']:.2f} mean {r['add_mean_mm']:.1f}mm")
    return rows


def hard_aug() -> A.AugmentConfig:
    """Augmentation stack for DR training: the reference set plus depth
    dropout (depth_missing_prob, off in reference training) — measured
    as the single worst unseen corruption on hard videos."""
    return A.AugmentConfig(depth_missing_prob=0.15)


def run_suite(
    object_names=("cube", "box", "lshape", "icosahedron"),
    *,
    steps: int = 5_000,
    frames: int = 120,
    batch: int = 200,
    res: int = 176,
    hard: bool = True,
    impl: str | None = None,
    log=_print_flush,
    on_result=None,
    ensemble: bool = False,
    ensemble_ckpt_dir: str | None = None,
    domain_shift: bool = False,
    shift_sensor=None,
    long_horizon_frames: int = 0,
    shift_sweep=(),
    sweep_objects=("cube", "lshape", "textured_box"),
    recovery_objects=(),
    live_recovery_objects=(),
    ablation_objects=(),
) -> list[dict]:
    """Train + track + score each object; returns per-object metric
    dicts (the framework's accuracy table).

    Defaults are the measured recipe: batch 200 (the reference's
    config.yml:19 batch, which the fused on-device step makes cheap) for
    5k steps = 1M DR pairs per object — the scale at which hard-video
    tracking converges (batch-32 runs drift).

    ``ensemble``: train all objects SIMULTANEOUSLY as an object ensemble
    (one program per step, one compile, one stats pass, resumable via
    ``ensemble_ckpt_dir`` — :func:`train_objects_ensemble`; single-chip
    throughput matches sequential, multi-chip meshes get true
    object-parallelism). The EVAL phase then also runs as one ensemble
    program per table (:func:`ensemble_evaluate_tracking` — one compile
    instead of one per object; observed videos quantized to sensor
    precision, uint8 RGB / uint16 mm depth, to bound HBM+RAM).
    ``domain_shift``: additionally evaluate each object on a
    domain-SHIFTED video (different lighting constants than the
    tracker's A branch, photometric drift, sensor-model depth, motion
    blur, noisy init — eval/domain_shift.py) and report both tables.
    ``long_horizon_frames``: when > 0, run the closed-loop long-horizon
    protocol (domain_shift.long_horizon_eval — health-score ReinitPolicy
    + noisy external re-init) over that many frames on EVERY object,
    attached as results[i]['long_horizon'].
    ``shift_sweep``: severities (e.g. (0.5, 1, 2, 4)) for the
    AUC-vs-severity curve on each object named in ``sweep_objects``
    (textured objects add a texture-hostile row) — results[i]
    ['shift_sweep'].
    ``recovery_objects``: object names that additionally run the
    long-horizon protocol with a FORCED mid-run failure (15-frame
    full-occlusion burst) and report detection latency + post-recovery
    AUC — results[i]['recovery'].
    ``live_recovery_objects``: object names that run the SAME forced
    failure through the LIVE path (StreamTracker + background-thread
    ReinitPolicy + on_track_lost, domain_shift.live_recovery_eval) —
    detection latency there is quantized by patience x refetch_every +
    the fetch round-trip, the number the offline protocol cannot give —
    results[i]['live_recovery'].
    ``ablation_objects``: object names that run the single-axis
    domain-shift ablation at severity x2 (which shift axis kills
    tracking — shift_axis_ablation) — results[i]['shift_ablation'].
    """
    unknown = [n for n in object_names if n not in OBJECTS]
    if unknown:  # fail BEFORE hours of training, not at the bad name
        raise KeyError(
            f"unknown object(s) {unknown}; available: {sorted(OBJECTS)}")
    dr = DRComposite() if hard else None
    aug = hard_aug() if hard else None
    objs = None
    if ensemble:
        # UV-textured objects cannot ride the ensemble: stack_meshes
        # bakes textures to vertex colors (per-object texture images
        # have different shapes), which would train the tracker's A
        # branch on baked renders while the eval video renders with the
        # real texture — a self-inflicted domain gap. Train/evaluate
        # them separately; everything else shares the one program.
        plain_names = [n for n in object_names
                       if OBJECTS[n]().texture is None]
        tex_names = [n for n in object_names if n not in plain_names]
        objs_by_name = {}
        if plain_names:
            for n, o in zip(plain_names, train_objects_ensemble(
                    plain_names, steps=steps, batch=batch, res=res,
                    dr=dr, aug=aug, impl=impl, log=log,
                    ckpt_dir=ensemble_ckpt_dir)):
                objs_by_name[n] = o
        for i, n in enumerate(tex_names):
            objs_by_name[n] = train_object(
                OBJECTS[n](), name=n, steps=steps, batch=batch, res=res,
                dr=dr, aug=aug, impl=impl,
                seed_offset=len(plain_names) + i, log=log,
                ckpt_dir=ensemble_ckpt_dir)
        objs = [objs_by_name[n] for n in object_names]
    from . import domain_shift as DS

    sensor = shift_sensor if shift_sensor is not None else DS.SensorModel()
    gt = make_gt_trajectory(frames)

    def _shifted_video(obj, idx):
        rgb2, dep2 = render_test_video(
            obj.mesh, gt, hard=hard, impl=impl, lighting=sensor.lighting())
        rgb_s, dep_s = DS.shift_video(rgb2, dep2, gt, YCB_K, sensor,
                                      seed=100 + idx)
        init = DS.noisy_init_pose(jax.random.PRNGKey(500 + idx), gt[0],
                                  sensor)
        rgb_s, dep_s = _quantize(rgb_s, dep_s)
        return rgb_s, dep_s, init

    # Ensemble eval fast path: ONE compiled program scores every
    # texture-free object's matched video, one more the shifted table
    # (VERDICT r3 #6) — on the remote-compile tunnel that replaces O
    # per-object track_video compiles (tens of seconds each). Textured
    # objects eval sequentially with their real UV pipeline.
    ens_matched = {}
    ens_shifted = {}
    ens_fallback = False
    if objs is not None:
        plain = [(i, o) for i, o in enumerate(objs)
                 if o.tm.texture is None]
        try:
            if plain:
                sub = [o for _, o in plain]
                vids = [_quantize(*render_test_video(
                    o.mesh, gt, hard=hard, impl=impl)) for o in sub]
                for (i, _), r in zip(plain, ensemble_evaluate_tracking(
                        sub, gt, np.stack([v[0] for v in vids]),
                        np.stack([v[1] for v in vids]))):
                    ens_matched[i] = r
                del vids
                if domain_shift:
                    svids, inits = [], []
                    for i, o in plain:
                        rgb_s, dep_s, init = _shifted_video(o, i)
                        svids.append((rgb_s, dep_s))
                        inits.append(np.asarray(init))
                    for (i, _), r in zip(plain, ensemble_evaluate_tracking(
                            sub, gt, np.stack([v[0] for v in svids]),
                            np.stack([v[1] for v in svids]),
                            init_poses=np.stack(inits))):
                        ens_shifted[i] = r
                    del svids
        except Exception as e:  # OOM etc: sequential path still works
            log(f"ensemble eval failed ({e!r}); FALLING BACK to "
                f"sequential per-object eval — rows will carry "
                f"eval_path='sequential_fallback' so the run of record "
                f"is self-describing")
            ens_matched = {}
            ens_shifted = {}
            ens_fallback = True

    results = []
    for idx, name in enumerate(object_names):
        if objs is not None:
            obj = objs[idx]
        else:
            obj = train_object(
                OBJECTS[name](), name=name, steps=steps, batch=batch,
                res=res, dr=dr, aug=aug, impl=impl, seed_offset=idx,
                log=log, ckpt_dir=ensemble_ckpt_dir,
            )
        if idx in ens_matched:
            r = ens_matched[idx]
            r["eval_path"] = "ensemble"
        else:
            frames_rgb, frames_depth = _quantize(*render_test_video(
                obj.mesh, gt, hard=hard, impl=impl))
            r = evaluate_tracking(obj, gt, frames_rgb, frames_depth)
            r["eval_path"] = ("sequential_fallback" if ens_fallback
                              else "sequential")
        r["train_secs"] = obj.train_secs
        r["symmetric"] = name in SYMMETRIC_OBJECTS
        r.pop("poses")
        # JSON-serializable per-frame curves
        r["add"] = [float(v) for v in r["add"]]
        r["adi"] = [float(v) for v in r["adi"]]
        log(f"[{name}] ADD AUC {r['add_auc']:.2f} "
            f"ADD-S AUC {r['adi_auc']:.2f} "
            f"mean {r['add_mean_mm']:.1f}mm "
            f"(hold-init {r['baseline_add_mean_mm']:.1f}mm)")
        if domain_shift:
            if idx in ens_shifted:
                rs = ens_shifted[idx]
                shift_path = "ensemble"
            else:
                rgb_s, dep_s, init = _shifted_video(obj, idx)
                rs = evaluate_tracking(obj, gt, rgb_s, dep_s,
                                       init_pose=init)
                shift_path = ("sequential_fallback" if ens_fallback
                              else "sequential")
            r["domain_shifted"] = {
                k: rs[k] for k in (
                    "add_auc", "adi_auc", "add_mean_mm", "add_max_mm",
                    "final_trans_err_mm")
            }
            r["domain_shifted"]["eval_path"] = shift_path
            log(f"[{name}] domain-shifted: "
                f"ADD AUC {rs['add_auc']:.2f} "
                f"ADD-S AUC {rs['adi_auc']:.2f} "
                f"mean {rs['add_mean_mm']:.1f}mm (noisy init, shifted "
                f"lighting/sensor)")
        if shift_sweep and name in sweep_objects:
            r["shift_sweep"] = shift_severity_sweep(
                obj, gt, hard=hard, impl=impl, severities=shift_sweep,
                sensor=sensor, seed=idx, log=log)
        if name in ablation_objects:
            r["shift_ablation"] = shift_axis_ablation(
                obj, gt, severity=2.0, hard=hard, impl=impl,
                sensor=sensor, seed=idx, log=log)
        if long_horizon_frames:
            gt_lh = make_gt_trajectory(long_horizon_frames, seed=17)
            rgb_lh, dep_lh = render_test_video(
                obj.mesh, gt_lh, hard=hard, impl=impl,
                lighting=sensor.lighting() if domain_shift else None)
            if domain_shift:
                rgb_lh, dep_lh = DS.shift_video(rgb_lh, dep_lh, gt_lh,
                                                YCB_K, sensor, seed=777)
            rgb_lh, dep_lh = _quantize(rgb_lh, dep_lh)
            r["long_horizon"] = DS.long_horizon_eval(
                obj, gt_lh, rgb_lh, dep_lh, YCB_K,
                reinit_sensor=sensor)
            lh = r["long_horizon"]
            log(f"[{name}] long-horizon {lh['frames']}fr: "
                f"ADD AUC {lh['add_auc']:.2f} "
                f"reinit x{lh['reinit_count']}")
            if name in recovery_objects:
                # forced 15-frame full-occlusion burst one third in:
                # detection latency + post-recovery AUC (VERDICT r3 #4)
                r["recovery"] = DS.long_horizon_eval(
                    obj, gt_lh, rgb_lh, dep_lh, YCB_K,
                    reinit_sensor=sensor,
                    fail_at=long_horizon_frames // 3, fail_len=15)
                rc = r["recovery"]
                log(f"[{name}] recovery (occlusion burst @"
                    f"{rc['fail_at']}+{rc['fail_len']}): detected in "
                    f"{rc['detection_latency']} frames, recovered at "
                    f"{rc['recovered_at']}, post-recovery ADD AUC "
                    f"{rc.get('post_recovery_add_auc', float('nan')):.2f}"
                    f", reinit x{rc['reinit_count']}")
            if name in live_recovery_objects:
                # the same burst through the LIVE path (StreamTracker +
                # background-fetch policy): latency quantized by
                # patience x refetch_every + round-trip (VERDICT r4 #4)
                r["live_recovery"] = DS.live_recovery_eval(
                    obj, gt_lh, rgb_lh, dep_lh, YCB_K,
                    reinit_sensor=sensor,
                    fail_at=long_horizon_frames // 3, fail_len=15)
                lv = r["live_recovery"]
                log(f"[{name}] LIVE recovery (burst @{lv['fail_at']}+"
                    f"{lv['fail_len']}, samples={lv['samples']}, "
                    f"refetch_every={lv['refetch_every']}): detected in "
                    f"{lv['detection_latency']} frames, reinit applied "
                    f"at {lv['reinit_applied_at']}, post-recovery ADD "
                    f"AUC "
                    f"{lv.get('post_recovery_add_auc', float('nan')):.2f}")
        results.append(r)
        if on_result is not None:  # incremental persistence for long runs
            on_result(list(results))
    return results
