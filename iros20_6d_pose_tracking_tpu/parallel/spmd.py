"""SPMD scale-out over a jax.sharding.Mesh (ICI collectives via GSPMD).

The reference is strictly single-GPU (SURVEY.md section 2 "Parallelism"),
so nothing here is needed for parity — this is the TPU-native scale-out
layer:

  - **dp**: batch data parallelism. Params replicated, batch sharded on
    the 'dp' axis; XLA inserts the gradient all-reduce over ICI.
  - **obj** (expert-style): per-object model ensemble. se(3)-TrackNet is
    trained PER OBJECT (reference trains one network per CAD model,
    README/dataset_info protocol), so the natural multi-chip axis is one
    model per mesh slice: params carry a leading object axis sharded on
    'obj', batches carry (obj, batch, ...) sharded ('obj', 'dp').

Both composit into a 2-D ('obj', 'dp') mesh. Tracking scale-out:
``batched_track_videos`` vmaps the fused tracking scan over many videos
and shards them across devices (throughput mode).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train import trainer as tr


def make_mesh(n_devices: int | None = None, obj: int = 1,
              devices=None) -> Mesh:
    """('obj', 'dp') mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % obj == 0, f"{n} devices not divisible into obj={obj}"
    arr = np.array(devices).reshape(obj, n // obj)
    return Mesh(arr, ("obj", "dp"))


def _leaf_spec(mesh: Mesh, leading_axis: str | None):
    def spec(x):
        if leading_axis is not None and getattr(x, "ndim", 0) >= 1:
            return NamedSharding(mesh, P(leading_axis))
        return NamedSharding(mesh, P())

    return spec


def shard_pytree(tree, mesh: Mesh, leading_axis: str | None):
    """Place a pytree on the mesh, sharding leading axes on
    ``leading_axis`` (None = fully replicated)."""
    spec = _leaf_spec(mesh, leading_axis)
    return jax.tree.map(lambda x: jax.device_put(x, spec(x)), tree)


def dp_train_step(model, tx, cfg: tr.TrainConfig, mesh: Mesh):
    """Pure data-parallel train step: replicated params, 'dp'-sharded batch.

    Returns a jitted function (state, key, raw_batch, mean, std) ->
    (state, metrics). The batch's leading dim must be divisible by the
    total mesh size (both axes are used for data here).
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(("obj", "dp")))

    def step(state, key, raw_batch, mean, std):
        raw_batch = jax.lax.with_sharding_constraint(
            raw_batch, jax.tree.map(lambda _: batch_sh, raw_batch)
        )
        return tr.train_step_impl(model, tx, cfg, state, key, raw_batch,
                                  mean, std)

    def constrained(state, key, raw_batch, mean, std):
        new_state, metrics = step(state, key, raw_batch, mean, std)
        # Keep params replicated on output (GSPMD would otherwise be free
        # to leave them in whatever layout the all-reduce produced).
        new_state = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, repl), new_state
        )
        return new_state, metrics

    return jax.jit(constrained, donate_argnums=(0,))


def ensemble_train_step(model, tx, cfg: tr.TrainConfig, mesh: Mesh,
                        per_object_stats: bool = False,
                        serial: bool | None = None):
    """Object-ensemble (EP) x data-parallel (DP) train step.

    State/keys carry a leading object axis sharded on 'obj'; batches are
    (obj, batch, ...) sharded ('obj', 'dp'). One jit; GSPMD lowers to
    per-slice compute + ICI all-reduce inside each object's dp group.

    ``per_object_stats``: mean/std carry a leading object axis too
    (each object's network normalizes with ITS OWN training statistics —
    the accuracy suite's ensemble mode); default shares one (8,) pair.

    ``serial`` (default: auto = single-device mesh): iterate objects
    with ``lax.map`` inside the one program instead of vmapping. On ONE
    device a vmapped per-object-WEIGHTS conv lowers to grouped
    convolutions the TPU runs catastrophically slowly (measured 6.7 s vs
    0.25 s per step at O=4 x batch 200 — 26x); lax.map keeps each
    object's convs in standard form at perfect scaling. On a multi-chip
    mesh the vmap path is right: GSPMD shards the object axis so each
    device runs its own object's ordinary convs in parallel.
    """
    if serial is None:
        serial = mesh.devices.size == 1
    if serial:
        def step_serial(state, keys, raw_batch, mean, std):
            O = keys.shape[0]
            if not per_object_stats:
                mean = jnp.broadcast_to(mean, (O,) + mean.shape)
                std = jnp.broadcast_to(std, (O,) + std.shape)

            def one(args):
                s, k, r, mn, sd = args
                return tr.train_step_impl(model, tx, cfg, s, k, r, mn, sd)

            return jax.lax.map(one, (state, keys, raw_batch, mean, std))

        return jax.jit(step_serial, donate_argnums=(0,))

    stats_axis = 0 if per_object_stats else None
    vstep = jax.vmap(
        functools.partial(tr.train_step_impl, model, tx, cfg),
        in_axes=(0, 0, 0, stats_axis, stats_axis),
    )
    obj_sh = _leaf_spec(mesh, "obj")
    batch_sh = NamedSharding(mesh, P("obj", "dp"))
    repl = NamedSharding(mesh, P())
    stats_sh = (lambda x: obj_sh(x)) if per_object_stats else (
        lambda x: repl)

    def step(state, keys, raw_batch, mean, std):
        state = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, obj_sh(x)), state
        )
        raw_batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sh), raw_batch
        )
        mean = jax.lax.with_sharding_constraint(mean, stats_sh(mean))
        std = jax.lax.with_sharding_constraint(std, stats_sh(std))
        return vstep(state, keys, raw_batch, mean, std)

    return jax.jit(step, donate_argnums=(0,))


def stack_states(states: list) -> Any:
    """Stack per-object TrainStates into an ensemble (leading obj axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def batched_track_videos(model, cfg, mesh: Mesh):
    """Shard V videos of one object across the mesh and scan each video's
    frames on its device — multi-video tracking throughput mode. The
    per-frame recurrence stays sequential (it must — frame t needs frame
    t-1's pose); parallelism is across videos, never across time
    (SURVEY.md section 5)."""
    from ..tracking import tracker as trk

    vtrack = jax.vmap(
        functools.partial(trk.track_video, model, cfg),
        in_axes=(None, None, None, None, None, 0, 0, 0),
    )
    vid_sh = NamedSharding(mesh, P(("obj", "dp")))

    def run(variables, mesh_arrays, K, mean, std, init_poses, frames_rgb,
            frames_depth):
        init_poses = jax.lax.with_sharding_constraint(init_poses, vid_sh)
        frames_rgb = jax.lax.with_sharding_constraint(frames_rgb, vid_sh)
        frames_depth = jax.lax.with_sharding_constraint(frames_depth, vid_sh)
        return vtrack(variables, mesh_arrays, K, mean, std, init_poses,
                      frames_rgb, frames_depth)

    return jax.jit(run)


def stack_meshes(meshes: list) -> Any:
    """Stack per-object TriMeshes into one ensemble MeshArrays with a
    leading object axis; faces padded to the largest object's count so
    shapes are uniform (fmask already marks real faces).

    Textured meshes are baked to vertex colors first: per-object texture
    images have different shapes and cannot share one stacked array."""
    import numpy as np

    from ..render import mesh as mesh_mod
    from ..render import rasterizer as rz

    max_f = max(m.faces.shape[0] for m in meshes)
    uploaded = []
    for m in meshes:
        if m.texture is not None and m.face_uvs is not None:
            m = mesh_mod.TriMesh(
                verts=m.verts,
                faces=m.faces,
                colors=mesh_mod.bake_texture_to_colors(
                    m.verts, m.faces[: m.num_faces],
                    m.face_uvs[: m.num_faces], m.texture),
                normals=m.normals,
                num_faces=m.num_faces,
            )
        pad = max_f - m.faces.shape[0]
        if pad:
            m = mesh_mod.TriMesh(
                verts=m.verts,
                faces=np.concatenate(
                    [m.faces, np.zeros((pad, 3), np.int32)], 0),
                colors=m.colors,
                normals=m.normals,
                num_faces=m.num_faces,
            )
        uploaded.append(rz.upload(m))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *uploaded)


def multi_object_track_videos(model, cfg, mesh: Mesh,
                              per_object_stats: bool = False,
                              serial: bool | None = None):
    """Track O objects (each with its own model weights, CAD mesh, ROI
    width, and video) in one SPMD program: vmap over the object axis,
    sharded on ('obj', 'dp'). The per-frame recurrence stays sequential
    per video; the ensemble axis is the parallel one.

    ``per_object_stats``: mean/std carry a leading object axis (each
    object's network normalizes with its own training statistics — the
    accuracy suite's ensemble mode); default shares one (8,) pair.

    ``serial`` (default: auto = single-device mesh): iterate objects
    with ``lax.map`` instead of vmapping — the same single-chip
    grouped-convolution hazard as :func:`ensemble_train_step` applies to
    the tracking CNN. One device gets per-object throughput parity with
    sequential tracking but ONE compile for the whole ensemble (the
    meshes are padded to one face count, so every per-object shape is
    identical); a multi-chip mesh runs objects in parallel via GSPMD.

    Returns run(ens_vars, ens_meshes, K, mean, std, init_poses,
    frames_rgb, frames_depth, widths) -> (O, T, 4, 4).
    """
    from ..tracking import tracker as trk

    if serial is None:
        serial = mesh.devices.size == 1
    stats_axis = 0 if per_object_stats else None
    if serial:
        def run_serial(ens_vars, ens_meshes, K, mean, std, init_poses,
                       frames_rgb, frames_depth, widths):
            O = init_poses.shape[0]
            if not per_object_stats:
                mean_b = jnp.broadcast_to(mean, (O,) + mean.shape)
                std_b = jnp.broadcast_to(std, (O,) + std.shape)
            else:
                mean_b, std_b = mean, std

            def one(args):
                v, m, mn, sd, ip, fr, fd, w = args
                return trk.track_video(model, cfg, v, m, K, mn, sd, ip,
                                       fr, fd, w)

            return jax.lax.map(one, (ens_vars, ens_meshes, mean_b, std_b,
                                     init_poses, frames_rgb, frames_depth,
                                     widths))

        return jax.jit(run_serial)

    vtrack = jax.vmap(
        functools.partial(trk.track_video, model, cfg),
        in_axes=(0, 0, None, stats_axis, stats_axis, 0, 0, 0, 0),
    )
    obj_sh = _leaf_spec(mesh, "obj")

    def run(ens_vars, ens_meshes, K, mean, std, init_poses, frames_rgb,
            frames_depth, widths):
        ens_vars = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, obj_sh(x)), ens_vars
        )
        ens_meshes = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, obj_sh(x)),
            ens_meshes,
        )
        return vtrack(ens_vars, ens_meshes, K, mean, std, init_poses,
                      frames_rgb, frames_depth, widths)

    return jax.jit(run)
