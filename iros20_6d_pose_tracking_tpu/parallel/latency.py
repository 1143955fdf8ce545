"""Latency-oriented SPMD: shard the RENDER across chips (sequence/spatial
parallelism for the tracker).

The per-frame recurrence is sequential (frame t needs frame t-1's pose,
SURVEY.md section 5), so throughput scale-out parallelizes across
objects/videos (parallel/spmd.py). This module instead cuts PER-FRAME
LATENCY: pass-1 rasterization — the step's dominant cost (docs/KERNEL.md)
— is embarrassingly parallel over FACES, so the face soup is sharded over
a 1-D ('sp',) mesh, every chip rasterizes its shard into a full ROI
z-buffer, and two ICI collectives merge the result:

  1. ``pmax`` over inverse depth   — the cross-chip z-test ((H, W) f32,
     ~124 KB at 176x176: trivially cheap on ICI),
  2. ``pmax`` over masked global winner ids — the cross-chip argmax,
  3. ``psum`` of the locally-gathered per-pixel attribute rows
     ((H*W, 30) f32) — each chip contributes rows for winners it owns.

Shading, ROI crop, CNN, and the se(3) update stay replicated (at batch 1
they are latency-bound, not capacity-bound). With pass-1 at ~1.0 ms of
the ~1.9 ms step, an 8-way face shard bounds the step at roughly
~1.0 ms + collectives — the single-object latency axis the reference
(single-GPU, single-context) has no analog for.

No multi-chip hardware exists in this environment: correctness is pinned
on the virtual 8-device CPU mesh (tests/test_parallel.py) and the design
targets ICI; re-measure the collective costs on real hardware.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import se3
from ..models import tracknet
from ..ops import roi as roi_ops
from ..render import rasterizer as rz


def sp_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D ('sp',) mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("sp",))


def shard_mesh_faces(mesh_arrays: rz.MeshArrays, mesh: Mesh) -> rz.MeshArrays:
    """Pad the face soup so every shard holds a multiple of 1024 faces and
    place it sharded on 'sp' (leading face axis). Padding faces carry
    fmask=False, the same poisoning the single-chip path uses.

    Texture/UV fields are dropped: the SP render path shades vertex
    colors only (the psum'd attribute-row protocol is fixed at 30
    columns). Bake a texture to vertex colors first
    (render/mesh.bake_texture_to_colors) to face-shard a textured mesh."""
    n = mesh.devices.size
    F = mesh_arrays.fverts.shape[0]
    granule = 1024 * n
    F_pad = -(-F // granule) * granule

    def pad(x, fill=0):
        if F_pad == F:
            return x
        width = [(0, F_pad - F)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, width, constant_values=fill)

    padded = rz.MeshArrays(
        fverts=pad(mesh_arrays.fverts),
        fcolors=pad(mesh_arrays.fcolors),
        fnormals=pad(mesh_arrays.fnormals),
        fmask=pad(mesh_arrays.fmask, fill=False),
    )
    sh = NamedSharding(mesh, P("sp"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), padded)


def sharded_render(cfg, mesh: Mesh):
    """shard_map'd face-parallel render: (sharded MeshArrays, pose, K,
    bbox) -> replicated (rgb, depth_mm) identical to rz.render.

    The per-shard winner search is rz.pass1 — the SAME dispatch the
    single-chip render uses — so a pass-1 change there cannot silently
    diverge this path; only the cross-chip merge lives here.
    ``cfg.cull_backfaces`` applies shard-locally as a mask (no
    compaction: the shard's block layout must stay aligned with its
    global face offsets for the winner-id merge)."""
    res = (cfg.resolution, cfg.resolution)

    def local(fverts, fcolors, fnormals, fmask, pose, K, bbox):
        lm = rz.MeshArrays(fverts, fcolors, fnormals, fmask)
        window = rz.window_from_bbox(bbox)
        fx, fy, fiz, fvalid, R, t = rz._project(
            lm, pose, K, window, res, cfg.near)
        if getattr(cfg, "cull_backfaces", False):
            fvalid = fvalid & ~rz._backface_mask(lm, R, t)
        _, iz, win = rz.pass1(fx, fy, fiz, fvalid, res,
                              impl=cfg.render_impl)

        Floc = fverts.shape[0]
        off = jax.lax.axis_index("sp") * Floc
        giz = jax.lax.pmax(iz, "sp")                      # cross-chip z-test
        cand = jnp.where((iz >= giz) & (iz > 1e-9), win + off, -1)
        gwin = jax.lax.pmax(cand, "sp")                   # cross-chip argmax
        zmin = 1.0 / jnp.maximum(giz, 1e-9)
        hit = (giz > 1e-9) & (zmin < cfg.far)

        attr = rz._face_attr_coefficients(fx, fy, fiz, fvalid, lm)
        lidx = (gwin - off).reshape(-1)
        mine = (lidx >= 0) & (lidx < Floc)
        rows = jnp.take(attr, jnp.clip(lidx, 0, Floc - 1), axis=0)
        rows = jnp.where(mine[:, None], rows, 0.0)
        rows = jax.lax.psum(rows, "sp")                   # owner contributes

        return rz.shade_rows(R, t, rows, zmin.reshape(-1), hit.reshape(-1),
                             res, depth_from_form=True)

    specs = dict(
        in_specs=(P("sp"), P("sp"), P("sp"), P("sp"), P(), P(), P()),
        out_specs=(P(), P()),
    )
    try:  # jax >= 0.8: varying-axis tracking rejects the mixed-vma
        return shard_map(local, mesh=mesh, check_vma=False, **specs)
    except TypeError:  # cond carry in _pass1_xla; disable the check
        return shard_map(local, mesh=mesh, check_rep=False, **specs)


def sp_track_step(model: tracknet.Se3TrackNet, cfg, mesh: Mesh):
    """Full tracking step with the render face-sharded over 'sp'.

    Returns a jitted fn(variables, sharded_mesh, K, mean, std, prev_pose,
    frame_rgb, frame_depth_mm) -> new 4x4 pose, trajectory-identical to
    tracking/tracker.track_step (tests pin this on the CPU mesh).
    """
    from ..tracking import tracker as trk

    render = sharded_render(cfg, mesh)
    res = (cfg.resolution, cfg.resolution)

    def step(variables, smesh, K, mean, std, prev_pose, frame_rgb,
             frame_depth_mm):
        bbox = roi_ops.compute_bbox(prev_pose, K, cfg.object_width_mm,
                                    (1000.0, 1000.0, 1000.0))
        rgbB, depthB = roi_ops.crop_bbox(frame_rgb, frame_depth_mm, bbox,
                                         res)
        rgbA, depthA = render(smesh.fverts, smesh.fcolors, smesh.fnormals,
                              smesh.fmask, prev_pose, K, bbox)
        bufA, bufB = trk.normalize_pair(
            rgbA, depthA, rgbB.astype(jnp.float32),
            depthB.astype(jnp.float32), prev_pose, mean, std)
        out = model.apply(variables, bufA[None], bufB[None], train=False)
        return se3.decode_delta(prev_pose, out["trans"][0], out["rot"][0],
                                cfg.trans_normalizer, cfg.rot_normalizer)

    return jax.jit(step)
