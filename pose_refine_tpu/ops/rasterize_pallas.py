"""Production batch depth rasterizer: a Pallas TPU kernel.

The reference scatters one CUDA thread per (triangle, pose) with atomicMin
into the framebuffer (renderer.cu:152-187). TPUs have no atomics, so this
kernel inverts the loop into a gather: the grid walks (pose, framebuffer
tile); each tile min-reduces the depth of every triangle block whose union
screen bbox intersects it. Culling is hierarchical and fully on-device:

  tile level    - a per-(pose, tile) hit count (XLA-precomputed) lets empty
                  tiles exit after writing zeros;
  superblock    - bbox over 8 blocks (1024 triangles), scalars in SMEM;
  block         - bbox over 128 triangles, scalars in SMEM;
  triangle      - the reference's own clamped per-triangle bbox test
                  (renderer.cu:100-125), vectorized on the VPU.

Triangles are expected in a spatially coherent order (mesh.morton_order) so
index-contiguous blocks have tight screen bboxes.

ONE kernel body serves every subtile geometry (the reference likewise needs
exactly one kernel, renderer.cu:152-187): _make_kernel(sub_w, sub_h)
instantiates it for the measured variants

  stripe8 - (128 x 8) row stripes: pixels-on-sublanes x triangles-on-lanes
            with no relayout; best when block bboxes are wide.
  tile32  - (32 x 32) square subtiles: a 128-lane vector packs 4 image rows
            (s -> y = 4p + s//32, x = s%32); square subtiles match the
            ~35 px Morton block bboxes (1.55x fewer (block, tile) pairs on
            the benchmark workload).
  tile16  - (16 x 16): tighter fit for dense meshes at down-sampled
            renders, 4x more subtile-scan overhead.

Inside every variant triangles live on LANES and pixel x on SUBLANES, so
per-triangle coefficients broadcast with no transposes; the (128, n_pass)
accumulator is relaid to image (sub_h, sub_w) once per subtile on write-out.

Barycentrics are affine in the pixel coordinate (coefficients precomputed per
pose by XLA), and the perspective depth is min-reduced as 1/denom where
denom = alpha/z0 + beta/z1 + gamma/z2 and alpha+beta+gamma == 1 by
construction - the reference's depth variant (renderer.cu:138-139). Output
semantics match rasterize.py: int32 mm, trunc(frag + 0.5), empty pixel = 0,
flipped y, ROI crop-while-rendering.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pose_refine_tpu.ops import rasterize as rz

BLOCK = 128        # triangles per block (lane-dim dynamic slices must be 128-aligned)
SUPER = 8          # blocks per superblock
BIG = 3.0e38       # "empty pixel" sentinel, above any real 1/denom

# variant name -> (sub_w, sub_h) subtile geometry
VARIANTS = {"stripe8": (128, 8), "tile32": (32, 32), "tile16": (16, 16)}


def _triangle_setup(tris, poses, proj, width: int, height: int, roi):
    """Per-(pose, triangle) affine coefficients + clamped bboxes.

    coef (N, 16, Tpad) f32, fields:
      0..2: beta  = kbx*px + kby*py + kb0
      3..5: gamma = kgx*px + kgy*py + kg0
      6..8: denom = ddx*px + ddy*py + dd0   (interpolated 1/z)
      9..12: x_start, y_start, x_max, y_max  (pixel-loop bounds,
             x_start = trunc(clamped_bbmin + 0.5), renderer.cu:124-125)
    bb (N, NB, 4) block union bboxes, sb (N, NSB, 4) superblock unions.
    """
    fields = rz.screen_fields(tris, poses, proj, width, height)
    n, t = fields[0].shape
    pad = (-t) % (BLOCK * SUPER)
    if pad:
        # degenerate padding: coords 0 (zero area -> every test fails below),
        # z 1 (no div-by-zero)
        def _pad(a, fill):
            return jnp.concatenate(
                [a, jnp.full((n, pad), fill, a.dtype)], axis=1
            )

        fields = tuple(
            _pad(a, 1.0 if i >= 6 else 0.0) for i, a in enumerate(fields)
        )
    ax, ay, bx, by, cx, cy, z0, z1, z2 = fields
    area2 = (cx - ax) * (by - ay) - (bx - ax) * (cy - ay)  # 2*signed area
    inv = 1.0 / area2

    kbx = -(cy - ay) * inv
    kby = (cx - ax) * inv
    kb0 = (ax * (cy - ay) - ay * (cx - ax)) * inv
    kgx = (by - ay) * inv
    kgy = -(bx - ax) * inv
    kg0 = (ay * (bx - ax) - ax * (by - ay)) * inv

    iz0, iz1_, iz2_ = 1.0 / z0, 1.0 / z1, 1.0 / z2
    diz1 = iz1_ - iz0
    diz2 = iz2_ - iz0
    ddx = kbx * diz1 + kgx * diz2
    ddy = kby * diz1 + kgy * diz2
    dd0 = kb0 * diz1 + kg0 * diz2 + iz0

    # clamped per-triangle screen bbox (triangle_bbox semantics,
    # renderer.cu:100-121, on the field layout)
    cmin, cmax = rz._clamp_bounds(width, height, roi)
    bbmin_x = jnp.maximum(jnp.minimum(jnp.minimum(ax, bx), cx), cmin[0])
    bbmin_y = jnp.maximum(jnp.minimum(jnp.minimum(ay, by), cy), cmin[1])
    bbmax_x = jnp.minimum(jnp.maximum(jnp.maximum(ax, bx), cx), cmax[0])
    bbmax_y = jnp.minimum(jnp.maximum(jnp.maximum(ay, by), cy), cmax[1])
    x_start = jnp.trunc(bbmin_x + 0.5)
    y_start = jnp.trunc(bbmin_y + 0.5)
    x_max = bbmax_x
    y_max = bbmax_y

    # degenerate / padded triangles: empty bbox so every test fails
    bad = ~jnp.isfinite(inv) | (area2 == 0.0)
    x_start = jnp.where(bad, BIG, x_start)
    y_start = jnp.where(bad, BIG, y_start)
    x_max = jnp.where(bad, -BIG, x_max)
    y_max = jnp.where(bad, -BIG, y_max)

    zero = jnp.zeros_like(kbx)
    coef = jnp.stack(
        [kbx, kby, kb0, kgx, kgy, kg0, ddx, ddy, dd0,
         x_start, y_start, x_max, y_max, zero, zero, zero],
        axis=1,
    )  # (N, 16, Tpad)
    coef = jnp.nan_to_num(coef, nan=0.0, posinf=BIG, neginf=-BIG)

    def unions(xs, ys, xm, ym, group):
        g = lambda a: a.reshape(n, -1, group)
        return jnp.stack(
            [g(xs).min(axis=2), g(ys).min(axis=2), g(xm).max(axis=2), g(ym).max(axis=2)],
            axis=2,
        )

    bb = unions(x_start, y_start, x_max, y_max, BLOCK)          # (N, NB, 4)
    sb = unions(x_start, y_start, x_max, y_max, BLOCK * SUPER)  # (N, NSB, 4)
    return coef, bb, sb


def _tile_counts(bb, out_h: int, out_w: int, height: int, roi,
                 tile_h: int, tile_w: int):
    """(N, TY, TX) int32: how many bbox groups intersect each tile.

    Called with the SUPERBLOCK bboxes: a conservative (never-miss) gate for
    the kernel's empty-tile early-out, 8x cheaper to plan than block-level."""
    ty = -(-out_h // tile_h)
    tx = -(-out_w // tile_w)
    rx, ry = roi[0], roi[1]

    tile_x_lo = (jnp.arange(tx) * tile_w + rx).astype(jnp.float32)
    tile_x_hi = tile_x_lo + (tile_w - 1)
    row0 = jnp.arange(ty) * tile_h
    tile_py_hi = (height - 1 - ry - row0).astype(jnp.float32)
    tile_py_lo = tile_py_hi - (tile_h - 1)

    x0, y0, x1, y1 = bb[..., 0], bb[..., 1], bb[..., 2], bb[..., 3]
    ix = (x0[:, :, None] <= tile_x_hi) & (x1[:, :, None] >= tile_x_lo)  # (N,NB,TX)
    iy = (y0[:, :, None] <= tile_py_hi) & (y1[:, :, None] >= tile_py_lo)  # (N,NB,TY)
    hit = ix[:, :, None, :] & iy[:, :, :, None]  # (N, NB, TY, TX)
    return hit.sum(axis=1).astype(jnp.int32), ty, tx


def _make_kernel(sub_w: int, sub_h: int):
    """Instantiate the rasterizer kernel body for one subtile geometry.

    A 128-lane f32 vector covers `rows_per_vec = 128 // sub_w` image rows of
    one subtile: sublane s holds pixel (x = s % sub_w, y-offset = s //
    sub_w), and `n_pass = sub_h // rows_per_vec` passes step the vector down
    the subtile. One grid step covers a full-width (sub_h, out_w) stripe -
    the subtile x-loop runs inside the kernel, cutting grid-step fixed costs
    by out_w / sub_w."""
    rows_per_vec = 128 // sub_w
    n_pass = (sub_h * sub_w) // 128
    assert rows_per_vec * sub_w == 128 and n_pass * rows_per_vec == sub_h
    assert n_pass <= 8  # the (128, 8) accumulator bounds the pass count

    def kernel(count_ref, sb_ref, bb_ref, coef_ref, out_ref, acc_ref,
               *, height, roi, nsb, out_w):
        ty = pl.program_id(1)
        rx, ry = roi[0], roi[1]
        py_top = jnp.float32(height - 1 - ry) - jnp.float32(ty * sub_h)
        py_bot = py_top - (sub_h - 1)
        n_sx = -(-out_w // sub_w)

        s_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        x_in_tile = (s_iota % sub_w).astype(jnp.float32)   # (128, 1)
        y_sub = (s_iota // sub_w).astype(jnp.float32)      # row within a pass

        for sx in range(n_sx):
            x_lo = jnp.float32(sx * sub_w + rx)
            x_hi = x_lo + (sub_w - 1)
            px = x_lo + x_in_tile
            py0 = py_top - y_sub  # pass p adds -(rows_per_vec * p)

            nhit = count_ref[0, ty, sx]
            acc_ref[...] = jnp.full((128, 8), BIG, jnp.float32)

            @pl.when(nhit > 0)
            def _process():
                def superblock_body(s, _):
                    s_hit = (
                        (sb_ref[0, s, 0] <= x_hi) & (sb_ref[0, s, 2] >= x_lo)
                        & (sb_ref[0, s, 1] <= py_top) & (sb_ref[0, s, 3] >= py_bot)
                    )

                    @pl.when(s_hit)
                    def _():
                        def block_body(b, _):
                            b_hit = (
                                (bb_ref[0, b, 0] <= x_hi) & (bb_ref[0, b, 2] >= x_lo)
                                & (bb_ref[0, b, 1] <= py_top) & (bb_ref[0, b, 3] >= py_bot)
                            )

                            @pl.when(b_hit)
                            def _():
                                off = pl.multiple_of(b * BLOCK, BLOCK)
                                blk = coef_ref[0, :, pl.ds(off, BLOCK)]  # (16, BLOCK)
                                kbx, kby, kb0 = blk[0:1], blk[1:2], blk[2:3]   # (1, 128)
                                kgx, kgy, kg0 = blk[3:4], blk[4:5], blk[5:6]
                                ddx, ddy, dd0 = blk[6:7], blk[7:8], blk[8:9]
                                xs, ys_ = blk[9:10], blk[10:11]
                                xm, ym = blk[11:12], blk[12:13]

                                x_ok = (px >= xs) & (px <= xm)  # (128 px, 128 tri)
                                b_beta = kbx * px + (kby * py0 + kb0)
                                b_gamma = kgx * px + (kgy * py0 + kg0)
                                b_denom = ddx * px + (ddy * py0 + dd0)

                                # static unroll: lane-dim slices of acc must
                                # be compile-time constants on TPU. (A
                                # per-pass bbox skip via pl.when was measured
                                # SLOWER - predication overhead exceeds the
                                # saved compute.)
                                for p in range(n_pass):
                                    dy = jnp.float32(rows_per_vec * p)
                                    py = py0 - dy
                                    beta = b_beta - kby * dy
                                    gamma = b_gamma - kgy * dy
                                    alpha = 1.0 - beta - gamma
                                    denom = b_denom - ddy * dy
                                    cov = (
                                        (beta >= 0.0) & (gamma >= 0.0) & (alpha >= 0.0)
                                        & x_ok & (py >= ys_) & (py <= ym)
                                    )
                                    depth = jnp.where(cov, 1.0 / denom, BIG)
                                    col = jnp.min(depth, axis=1, keepdims=True)  # (128, 1)
                                    acc_ref[:, p : p + 1] = jnp.minimum(
                                        acc_ref[:, p : p + 1], col
                                    )

                            return 0

                        jax.lax.fori_loop(s * SUPER, (s + 1) * SUPER, block_body, 0)

                    return 0

                jax.lax.fori_loop(0, nsb, superblock_body, 0)

            acc = acc_ref[:, 0:n_pass]
            fb = jnp.where(acc >= BIG, 0, jnp.trunc(acc + 0.5).astype(jnp.int32))
            # (s = y_off*sub_w + x, p) -> image (y = rows_per_vec*p + y_off, x)
            img = (
                fb.reshape(rows_per_vec, sub_w, n_pass)
                .transpose(2, 0, 1)
                .reshape(sub_h, sub_w)
            )
            w = min(sub_w, out_w - sx * sub_w)
            out_ref[0, :, sx * sub_w : sx * sub_w + w] = img[:, :w]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("width", "height", "roi", "interpret", "variant")
)
def rasterize_pallas(
    tris,
    poses,
    width: int,
    height: int,
    proj,
    roi: Tuple[int, int, int, int] = (0, 0, 0, 0),
    interpret: bool = False,
    variant: str = "tile32",
):
    """Render N poses -> (N, out_h, out_w) int32 depth mm. TPU fast path.

    variant: 'tile32' (square 32x32 subtiles - default, fastest on meshes
    with small triangles), 'tile16' (dense meshes at down-sampled renders),
    or 'stripe8' (8x128 row-stripe tiles)."""
    if variant not in VARIANTS:
        raise ValueError(f"unknown variant {variant!r}; options {sorted(VARIANTS)}")
    sub_w, sub_h = VARIANTS[variant]
    out_w, out_h = rz.roi_shape(width, height, roi)
    poses = jnp.asarray(poses, jnp.float32)
    n = poses.shape[0]

    coef, bb, sb = _triangle_setup(tris, poses, proj, width, height, roi)
    count, ty, tx = _tile_counts(
        sb, out_h, out_w, height, roi, tile_h=sub_h, tile_w=sub_w
    )
    nb, nsb = bb.shape[1], sb.shape[1]

    kernel = functools.partial(
        _make_kernel(sub_w, sub_h), height=height, roi=roi, nsb=nsb, out_w=out_w
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, ty),
        in_specs=[
            pl.BlockSpec((1, ty, tx), lambda n_, y: (n_, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nsb, 4), lambda n_, y: (n_, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb, 4), lambda n_, y: (n_, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 16, coef.shape[2]), lambda n_, y: (n_, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, sub_h, out_w), lambda n_, y: (n_, y, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w), jnp.int32),
        scratch_shapes=[pltpu.VMEM((128, 8), jnp.float32)],
        interpret=interpret,
    )(count, sb, bb, coef)
    return out
