"""Pallas TPU kernel for rasterization pass 1 (z-buffer winner search).

The XLA path (rasterizer.py) is HBM-bound: each (pixel x face-block) step
materializes several (P, Fb) f32 intermediates. This kernel keeps the
entire pair computation in VMEM/registers and writes only two (P,) outputs
(best 1/z and winning face index), making the pass VPU-compute-bound.

Formulation (per face, precomputed on device in the prologue):
  - Three sign-folded edge forms e_k(p) = a_k px + b_k py + c_k, with the
    triangle's winding sign folded into the coefficients so coverage is
    simply min(e0, e1, e2) >= 0.
  - The screen-interpolated inverse depth is ITSELF a linear form
    izpix(p) = aw px + bw py + cw (1/z is affine in screen space), so the
    z-test needs no division: the winner is argmax izpix among covered
    faces (max 1/z == min z).
  - Faces that are invalid (behind near plane, degenerate, padding) get
    coefficients (0, 0, -1): never covered. No validity lanes needed.

Pixel coordinates are reconstructed in-kernel from the flat pixel index
(iota), so the only inputs are the (12, F) coefficient matrix and a
per-face-block screen bbox used to SKIP (pixel-tile, face-block) pairs
that cannot interact — the software analog of GL's hardware binning,
effective because mesh faces are Morton-ordered (render/mesh.py).

Replaces: GL rasterization + depth readback
(reference vispy_renderer.py:152-169).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Coefficient row layout in the (12, F) matrix.
ROW_A0, ROW_B0, ROW_C0 = 0, 1, 2
ROW_A1, ROW_B1, ROW_C1 = 3, 4, 5
ROW_A2, ROW_B2, ROW_C2 = 6, 7, 8
ROW_AW, ROW_BW, ROW_CW = 9, 10, 11

DEF_PIX_TILE = 512
DEF_FACE_BLOCK = 512


def build_face_coefficients(fx, fy, fiz, fvalid):
    """Per-face linear-form coefficients (12, F), sign-folded, with
    invalid faces poisoned to never-covered.

    fx, fy: (F, 3) screen coords of the triangle vertices;
    fiz: (F, 3) per-vertex 1/z; fvalid: (F,) bool.
    """
    x0, x1, x2 = fx[:, 0], fx[:, 1], fx[:, 2]
    y0, y1, y2 = fy[:, 0], fy[:, 1], fy[:, 2]
    a0, b0, c0 = y1 - y2, x2 - x1, x1 * y2 - x2 * y1
    a1, b1, c1 = y2 - y0, x0 - x2, x2 * y0 - x0 * y2
    a2, b2, c2 = y0 - y1, x1 - x0, x0 * y1 - x1 * y0
    area = a0 * x0 + b0 * y0 + c0
    ok = fvalid & (jnp.abs(area) > 1e-4)
    s = jnp.where(area >= 0, 1.0, -1.0)
    inv_area = jnp.where(ok, 1.0 / jnp.where(ok, area, 1.0), 0.0)
    w0, w1, w2 = fiz[:, 0] * inv_area, fiz[:, 1] * inv_area, fiz[:, 2] * inv_area
    aw = a0 * w0 + a1 * w1 + a2 * w2
    bw = b0 * w0 + b1 * w1 + b2 * w2
    cw = c0 * w0 + c1 * w1 + c2 * w2

    def fold(v):
        return jnp.where(ok, v * s, 0.0)

    def fold_c(v):
        return jnp.where(ok, v * s, -1.0)

    coef = jnp.stack(
        [
            fold(a0), fold(b0), fold_c(c0),
            fold(a1), fold(b1), fold_c(c1),
            fold(a2), fold(b2), fold_c(c2),
            jnp.where(ok, aw, 0.0), jnp.where(ok, bw, 0.0),
            jnp.where(ok, cw, 0.0),
        ],
        axis=0,
    )
    return coef.astype(jnp.float32), ok


def build_face_bboxes(fx, fy, fvalid):
    """Per-face screen bbox (F, 4): [xmin, xmax, ymin, ymax]; invalid
    faces get an empty bbox (xmin > xmax)."""
    big = jnp.float32(3.0e8)
    vx = jnp.where(fvalid[:, None], fx, big)
    vy = jnp.where(fvalid[:, None], fy, big)
    xmin = vx.min(axis=1)
    ymin = vy.min(axis=1)
    vx = jnp.where(fvalid[:, None], fx, -big)
    vy = jnp.where(fvalid[:, None], fy, -big)
    xmax = vx.max(axis=1)
    ymax = vy.max(axis=1)
    return jnp.stack([xmin, xmax, ymin, ymax], axis=1).astype(jnp.float32)


def reduce_block_bboxes(face_bbox, face_block: int):
    """Union per-face bboxes into per-face-block bboxes (nb, 4).
    ``face_bbox.shape[0]`` must be a multiple of ``face_block``."""
    F = face_bbox.shape[0]
    assert F % face_block == 0, (F, face_block)
    r = face_bbox.reshape(F // face_block, face_block, 4)
    return jnp.stack(
        [r[..., 0].min(axis=1), r[..., 1].max(axis=1),
         r[..., 2].min(axis=1), r[..., 3].max(axis=1)],
        axis=1,
    )


def build_block_bboxes(fx, fy, fvalid, face_block: int):
    """Per-face-block screen bbox (nb, 4): [xmin, xmax, ymin, ymax],
    nb = ceil(F / face_block) (trailing partial blocks padded empty).
    Invalid-only blocks get an empty bbox (xmin > xmax)."""
    F = fx.shape[0]
    if F % face_block:
        pad = face_block - F % face_block
        fx = jnp.concatenate([fx, jnp.zeros((pad, 3), fx.dtype)], 0)
        fy = jnp.concatenate([fy, jnp.zeros((pad, 3), fy.dtype)], 0)
        fvalid = jnp.concatenate(
            [fvalid, jnp.zeros((pad,), jnp.bool_)], 0)
        F += pad
    nb = F // face_block
    big = jnp.float32(3.0e8)
    vx = jnp.where(fvalid[:, None], fx, big)
    vy = jnp.where(fvalid[:, None], fy, big)
    xmin = vx.reshape(nb, -1).min(axis=1)
    ymin = vy.reshape(nb, -1).min(axis=1)
    vx = jnp.where(fvalid[:, None], fx, -big)
    vy = jnp.where(fvalid[:, None], fy, -big)
    xmax = vx.reshape(nb, -1).max(axis=1)
    ymax = vy.reshape(nb, -1).max(axis=1)
    return jnp.stack([xmin, xmax, ymin, ymax], axis=1).astype(jnp.float32)


def _kernel(bbox_ref, coef_ref, iz_ref, idx_ref, *,
            pix_tile, face_block, width, n_blocks):
    """Grid is pixel tiles only; the face-block loop runs INSIDE the
    kernel over the VMEM-resident (12, F) coefficient matrix. This keeps
    the per-block skip essentially free: a skipped block costs one SMEM
    bbox test, not a grid step + block DMA. The whole coefficient matrix
    is a few hundred KB for typical meshes — far under VMEM.

    Winner search uses a PACKED KEY: positive IEEE-754 floats order the
    same as their bit patterns, so ``(iz_bits & ~lane_mask) | lane`` is a
    single int whose max is simultaneously the depth test and the argmax —
    ONE cross-lane reduction per block instead of a max-reduce plus a
    compare/select/min-reduce. The stolen low mantissa bits cost < 2^-13
    relative depth (~0.1 mm at 0.6 m), and only in the *comparison*:
    pass 2 recomputes exact depth from the winner's linear form."""
    assert face_block & (face_block - 1) == 0, "face_block must be 2^n"
    lane_mask = face_block - 1
    i = pl.program_id(0)
    first_q = i * pix_tile
    # Tile's pixel-row range for the bbox skip test.
    y0 = (first_q // width).astype(jnp.float32)
    y1 = ((first_q + pix_tile - 1) // width).astype(jnp.float32)
    q = first_q + jax.lax.broadcasted_iota(jnp.int32, (pix_tile, 1), 0)
    px = (q % width).astype(jnp.float32)
    py = (q // width).astype(jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (pix_tile, face_block), 1)

    def block(j, carry):
        acc_key, acc_idx = carry
        xmin = bbox_ref[j, 0]
        xmax = bbox_ref[j, 1]
        ymin = bbox_ref[j, 2]
        ymax = bbox_ref[j, 3]
        hit = ((xmax >= 0.0) & (xmin <= width - 1.0)
               & (ymax >= y0) & (ymin <= y1))

        def body(carry):
            acc_key, acc_idx = carry
            s = pl.multiple_of(j * face_block, face_block)

            def form(row):
                a = coef_ref[row, pl.ds(s, face_block)].reshape(1, face_block)
                b = coef_ref[row + 1, pl.ds(s, face_block)].reshape(1, face_block)
                c = coef_ref[row + 2, pl.ds(s, face_block)].reshape(1, face_block)
                return px * a + py * b + c

            e0 = form(ROW_A0)
            e1 = form(ROW_A1)
            e2 = form(ROW_A2)
            izp = form(ROW_AW)
            covered = (jnp.minimum(jnp.minimum(e0, e1), e2) >= 0.0) \
                & (izp > 0.0)
            bits = jax.lax.bitcast_convert_type(izp, jnp.int32)
            key = jnp.where(covered, (bits & ~lane_mask) | lanes,
                            jnp.int32(-1))
            best = jnp.max(key, axis=1, keepdims=True)  # (TP, 1), ONE reduce
            better = best > acc_key
            return (
                jnp.where(better, best, acc_key),
                jnp.where(better, (best & lane_mask) + j * face_block,
                          acc_idx),
            )

        return jax.lax.cond(hit, body, lambda c: c, (acc_key, acc_idx))

    init = (
        jnp.full((pix_tile, 1), -1, jnp.int32),
        jnp.zeros((pix_tile, 1), jnp.int32),
    )
    acc_key, acc_idx = jax.lax.fori_loop(0, n_blocks, block, init)
    iz_ref[:] = jnp.where(
        acc_key < 0, jnp.float32(-1.0),
        jax.lax.bitcast_convert_type(acc_key & ~lane_mask, jnp.float32),
    )
    idx_ref[:] = acc_idx


def pallas_pass1(coef, block_bbox, hw: tuple[int, int],
                 pix_tile: int = DEF_PIX_TILE,
                 face_block: int = DEF_FACE_BLOCK,
                 interpret: bool = False):
    """Run the pass-1 kernel for an (H, W) target. Returns
    (izbest (H, W) f32, winner (H, W) i32)."""
    H, W = hw
    P = H * W
    n_pix_tiles = -(-P // pix_tile)
    P_pad = n_pix_tiles * pix_tile
    F = coef.shape[1]
    if F % face_block:
        # Pad with poisoned (never-covered) lanes and empty bboxes.
        pad = face_block - F % face_block
        pad_coef = jnp.zeros((12, pad), coef.dtype)
        pad_coef = pad_coef.at[ROW_C0].set(-1.0)
        pad_coef = pad_coef.at[ROW_C1].set(-1.0)
        pad_coef = pad_coef.at[ROW_C2].set(-1.0)
        coef = jnp.concatenate([coef, pad_coef], axis=1)
        F += pad
    n_blocks = F // face_block
    assert block_bbox.shape[0] == n_blocks, (
        f"block_bbox has {block_bbox.shape[0]} rows, kernel needs {n_blocks}"
    )
    # The (12, F) coefficient matrix stays VMEM-resident (~16 MB/core):
    # beyond ~200k faces, decimate the mesh (render/mesh.py::decimate) —
    # a 176x176 ROI cannot resolve that much geometry anyway.
    assert F * 12 * 4 <= 12 * 1024 * 1024, (
        f"{F} faces exceed the VMEM-resident budget; "
        "decimate the mesh (render/mesh.py::decimate)"
    )

    kernel = functools.partial(
        _kernel,
        pix_tile=pix_tile,
        face_block=face_block,
        width=W,
        n_blocks=n_blocks,
    )
    iz, idx = pl.pallas_call(
        kernel,
        grid=(n_pix_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # block_bbox (nb, 4)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # coef (12, F), resident
        ],
        out_specs=[
            pl.BlockSpec((pix_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pix_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((P_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(block_bbox, coef)
    iz = iz[:P, 0].reshape(H, W)
    idx = idx[:P, 0].reshape(H, W)
    return iz, idx


# ---------------------------------------------------------------------------
# Pass-2 attribute-row gather: one-hot MXU matmul over the winner range.
# ---------------------------------------------------------------------------

def split_f32_to_bf16_terms(x):
    """Exact 3-term bf16 decomposition of f32: hi + mid + lo == x bitwise
    (24-bit mantissa = 3 x 8-bit bf16 terms; round-to-nearest makes each
    residual exactly representable). Lets the MXU gather f32 rows EXACTLY:
    onehot @ hi + onehot @ mid + onehot @ lo with f32 accumulation selects
    each term exactly (0/1 products are exact, the three terms reassemble
    the original mantissa without rounding)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _gather_kernel(winner_ref, cov_ref, hi_ref, mid_ref, lo_ref, out_ref, *,
                   pix_tile, chunk, n_chunks, ncols):
    """Per pixel tile: rows[p, :] = attr[winner[p], :] via one-hot
    matmuls on the MXU, visiting only face chunks inside the tile's
    [min, max] winner range.

    TPU has no general vector gather; XLA lowers jnp.take to a slow
    HBM-side loop (~0.34 ms for 31k x 36 f32 at 176^2 — docs/KERNEL.md).
    Here each chunk visit is (tile, chunk) @ (chunk, C) on the MXU with
    the one-hot selector built in VMEM. Winners within a pixel tile are
    spatially coherent (Morton-ordered faces), so the range test skips
    most chunks; non-covered pixels are excluded from the range and
    produce zero rows (callers mask them by `hit` anyway)."""
    w = winner_ref[:]                      # (tile, 1) int32
    cov = cov_ref[:]                       # (tile, 1) int32, 1 = covered
    big = jnp.int32(1 << 30)
    wmin = jnp.min(jnp.where(cov == 1, w, big))
    wmax = jnp.max(jnp.where(cov == 1, w, jnp.int32(-1)))
    c0 = wmin // chunk
    c1 = wmax // chunk                     # inclusive; -1 when none covered
    lanes = jax.lax.broadcasted_iota(jnp.int32, (pix_tile, chunk), 1)

    def body(j, acc):
        def visit(acc):
            s = pl.multiple_of(j * chunk, chunk)
            onehot = (lanes == (w - s)).astype(jnp.bfloat16)
            sel = lambda ref: jax.lax.dot_general(
                onehot, ref[pl.ds(s, chunk), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + sel(hi_ref) + sel(mid_ref) + sel(lo_ref)

        return jax.lax.cond((j >= c0) & (j <= c1), visit, lambda a: a, acc)

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((pix_tile, ncols), jnp.float32))
    out_ref[:] = acc


def pallas_gather_rows(attr, winner_flat, covered_flat,
                       pix_tile: int = DEF_PIX_TILE, chunk: int = 512,
                       interpret: bool = False):
    """rows[p, :] = attr[winner_flat[p], :] for covered pixels (zeros
    elsewhere): the fused pass-2 gather. attr (F, C) f32; winner_flat (P,)
    int32 (any values for non-covered pixels); covered_flat (P,) bool."""
    F, C = attr.shape
    P = winner_flat.shape[0]
    if F % chunk:
        attr = jnp.concatenate(
            [attr, jnp.zeros((chunk - F % chunk, C), attr.dtype)], axis=0)
        F = attr.shape[0]
    n_chunks = F // chunk
    n_tiles = -(-P // pix_tile)
    P_pad = n_tiles * pix_tile
    if P_pad != P:
        winner_flat = jnp.concatenate(
            [winner_flat, jnp.zeros((P_pad - P,), winner_flat.dtype)])
        covered_flat = jnp.concatenate(
            [covered_flat, jnp.zeros((P_pad - P,), jnp.bool_)])
    hi, mid, lo = split_f32_to_bf16_terms(attr)
    kernel = functools.partial(
        _gather_kernel, pix_tile=pix_tile, chunk=chunk, n_chunks=n_chunks,
        ncols=C)
    rows = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((pix_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # winner
            pl.BlockSpec((pix_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # covered
            pl.BlockSpec(memory_space=pltpu.VMEM),   # hi (F, C), resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mid
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lo
        ],
        out_specs=pl.BlockSpec((pix_tile, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_pad, C), jnp.float32),
        interpret=interpret,
    )(winner_flat.reshape(-1, 1).astype(jnp.int32),
      covered_flat.reshape(-1, 1).astype(jnp.int32), hi, mid, lo)
    return rows[:P]


# ---------------------------------------------------------------------------
# Work-list (compacted binning) variant: compute ONLY intersecting
# (pixel-tile, face-block) pairs.
# ---------------------------------------------------------------------------

def build_worklist(block_bbox, hw, pix_tile, width):
    """Tile-major compacted list of intersecting (tile, block) pairs.

    Returns (tile_ids, block_ids, init_flags, valid_flags), each (W,)
    int32 with W = n_tiles * n_blocks (static). Real entries come first
    in tile-major order (stable sort), padding entries repeat the last
    real tile with valid=0 so the kernel's output block stays resident
    and untouched.
    """
    H, W_img = hw
    P = H * W_img
    n_tiles = -(-P // pix_tile)
    nb = block_bbox.shape[0]
    tile_first = jnp.arange(n_tiles) * pix_tile
    y0 = (tile_first // width).astype(jnp.float32)       # (T,)
    y1 = ((tile_first + pix_tile - 1) // width).astype(jnp.float32)
    xmin, xmax = block_bbox[:, 0], block_bbox[:, 1]      # (B,)
    ymin, ymax = block_bbox[:, 2], block_bbox[:, 3]
    hit = (
        (xmax[None, :] >= 0.0)
        & (xmin[None, :] <= width - 1.0)
        & (ymax[None, :] >= y0[:, None])
        & (ymin[None, :] <= y1[:, None])
    )  # (T, B)
    flat_hit = hit.reshape(-1)
    order = jnp.argsort(jnp.where(flat_hit, 0, 1), stable=True)
    sorted_hit = flat_hit[order]
    tiles = (order // nb).astype(jnp.int32)
    blocks = (order % nb).astype(jnp.int32)
    n_real = jnp.sum(flat_hit.astype(jnp.int32))
    last_real_tile = tiles[jnp.maximum(n_real - 1, 0)]
    tiles = jnp.where(sorted_hit, tiles, last_real_tile)
    blocks = jnp.where(sorted_hit, blocks, 0)
    idx = jnp.arange(tiles.shape[0])
    first = sorted_hit & ((idx == 0) | (tiles != jnp.roll(tiles, 1)))
    # Tiles with NO hits never appear: their outputs must still be
    # initialized. Handled by the caller pre-zeroing the output arrays.
    return (tiles, blocks, first.astype(jnp.int32),
            sorted_hit.astype(jnp.int32))


def _wl_kernel(tile_ids, block_ids, init_flags, valid_flags,
               coef_ref, iz_in, idx_in, iz_ref, idx_ref, *,
               pix_tile, face_block, width):
    """Work-list variant of the packed-key winner search (see _kernel);
    the int32 accumulator ref holds the packed key directly."""
    lane_mask = face_block - 1
    k = pl.program_id(0)
    tile = tile_ids[k]
    blk = block_ids[k]

    @pl.when(init_flags[k] == 1)
    def _():
        iz_ref[:] = jnp.full_like(iz_ref, -1)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    @pl.when(valid_flags[k] == 1)
    def _():
        first_q = tile * pix_tile
        q = first_q + jax.lax.broadcasted_iota(jnp.int32, (pix_tile, 1), 0)
        px = (q % width).astype(jnp.float32)
        py = (q // width).astype(jnp.float32)
        s = blk * face_block

        def form(row):
            a = coef_ref[row, pl.ds(s, face_block)].reshape(1, face_block)
            b = coef_ref[row + 1, pl.ds(s, face_block)].reshape(1, face_block)
            c = coef_ref[row + 2, pl.ds(s, face_block)].reshape(1, face_block)
            return px * a + py * b + c

        e0 = form(ROW_A0)
        e1 = form(ROW_A1)
        e2 = form(ROW_A2)
        izp = form(ROW_AW)
        covered = (jnp.minimum(jnp.minimum(e0, e1), e2) >= 0.0) \
            & (izp > 0.0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (pix_tile, face_block), 1)
        bits = jax.lax.bitcast_convert_type(izp, jnp.int32)
        key = jnp.where(covered, (bits & ~lane_mask) | lanes, jnp.int32(-1))
        best = jnp.max(key, axis=1, keepdims=True)
        better = best > iz_ref[:]
        iz_ref[:] = jnp.where(better, best, iz_ref[:])
        idx_ref[:] = jnp.where(better, (best & lane_mask) + blk * face_block,
                               idx_ref[:])


def pallas_pass1_worklist(coef, block_bbox, hw: tuple[int, int],
                          pix_tile: int = DEF_PIX_TILE,
                          face_block: int = 256,
                          interpret: bool = False):
    """Binned pass 1: grid over a compacted tile-major work list of
    intersecting (pixel-tile, face-block) pairs. Compute scales with the
    number of intersections instead of tiles x blocks; pairs that cannot
    interact cost one predicated-off grid step.

    Semantically identical to :func:`pallas_pass1`.
    """
    H, W = hw
    P = H * W
    n_tiles = -(-P // pix_tile)
    P_pad = n_tiles * pix_tile
    F = coef.shape[1]
    assert F % face_block == 0
    n_blocks = F // face_block
    assert block_bbox.shape[0] == n_blocks

    tiles, blocks, first, valid = build_worklist(
        block_bbox, hw, pix_tile, W
    )
    max_work = int(tiles.shape[0])

    assert face_block & (face_block - 1) == 0, "face_block must be 2^n"
    kernel = functools.partial(
        _wl_kernel, pix_tile=pix_tile, face_block=face_block, width=W,
    )
    # Pre-initialized outputs double as accumulators via
    # input_output_aliases, covering tiles that never appear in the work
    # list. The f32 accumulator is the int32 packed key.
    iz0 = jnp.full((P_pad, 1), -1, jnp.int32)
    idx0 = jnp.zeros((P_pad, 1), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(max_work,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # coef
            pl.BlockSpec((pix_tile, 1), lambda k, t, b, f, v: (t[k], 0),
                         memory_space=pltpu.VMEM),   # iz_in (aliased)
            pl.BlockSpec((pix_tile, 1), lambda k, t, b, f, v: (t[k], 0),
                         memory_space=pltpu.VMEM),   # idx_in (aliased)
        ],
        out_specs=[
            pl.BlockSpec((pix_tile, 1), lambda k, t, b, f, v: (t[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pix_tile, 1), lambda k, t, b, f, v: (t[k], 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    key, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((P_pad, 1), jnp.int32),
        ],
        input_output_aliases={5: 0, 6: 1},  # (4 scalars + coef) offsets
        interpret=interpret,
    )(tiles, blocks, first, valid, coef, iz0, idx0)
    lane_mask = face_block - 1
    iz = jnp.where(
        key < 0, jnp.float32(-1.0),
        jax.lax.bitcast_convert_type(key & ~lane_mask, jnp.float32),
    )
    return iz[:P, 0].reshape(H, W), idx[:P, 0].reshape(H, W)
