"""Fused exact-NN Pallas kernel ("flash-NN").

The XLA formulation of brute-force NN (scan of matmul + argmin chunks,
scene/nn.py) materializes (Q, chunk) distance blocks in HBM and pays large
per-op overheads; this kernel keeps the ENTIRE scene resident in VMEM
(field-major (8, S): tens of KB..MB for realistic scenes) and streams query
tiles through, maintaining the minimum online - the flash-attention trick
applied to nearest neighbors.

Scoring: argmin_s |q - s|^2 = argmin_s (|s|^2 - 2 q.s): three FMAs + one add
per (query, scene) pair on the VPU, queries on sublanes, scene points on
lanes. The inner chunk loop is PURELY elementwise - it tracks, per (query,
lane slot), the best score across chunks and the chunk that achieved it;
the single cross-lane reduction happens once after the loop. Tie-breaking
matches the reference leaf scan (pcd_scene.h:86-95): strictly-smaller wins,
so the smallest global index is kept.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_TILE = 1024   # queries per grid step (sublane axis)
S_CHUNK = 128   # scene points per inner step (lane axis)
BIG = 3.0e38
IBIG = 2**30


def pack_scene(scene_pts) -> jnp.ndarray:
    """(S, 3) points -> (8, S_pad) field-major [x, y, z, |s|^2] VMEM table.
    Padded entries carry |s|^2 = BIG so they never win the min; their coords
    repeat the last real point so per-chunk bounding boxes stay tight (the
    gated kernel prunes on them)."""
    s = jnp.asarray(scene_pts, jnp.float32)
    ns = s.shape[0]
    spad = (-ns) % S_CHUNK
    ssq = jnp.sum(s * s, axis=-1, keepdims=True)
    stab = jnp.concatenate([s, ssq, jnp.zeros((ns, 4), jnp.float32)], axis=1)
    if spad:
        pad_rows = jnp.concatenate(
            [jnp.broadcast_to(s[-1:], (spad, 3)),
             jnp.full((spad, 1), BIG, jnp.float32),
             jnp.zeros((spad, 4), jnp.float32)],
            axis=1,
        )
        stab = jnp.concatenate([stab, pad_rows], axis=0)
    return stab.T  # (8, S_pad)


def chunk_boxes(scene_table) -> jnp.ndarray:
    """Per-S_CHUNK bounding boxes of a pack_scene table.

    (8, S_pad) -> (Nc, 8) f32 [xlo, ylo, zlo, 0, xhi, yhi, zhi, 0]. The
    kd-build reorder (scene/kdtree.py) makes index-contiguous chunks
    spatially tight, exactly like mesh.morton_order does for the raster
    kernel's triangle blocks."""
    pts = scene_table[:3].reshape(3, -1, S_CHUNK)  # (3, Nc, C)
    lo = pts.min(axis=2).T  # (Nc, 3)
    hi = pts.max(axis=2).T
    z = jnp.zeros((lo.shape[0], 1), jnp.float32)
    return jnp.concatenate([lo, z, hi, z], axis=1)


def _kernel(scene_ref, q_ref, idx_ref, dist_ref):
    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    n_chunks = scene_ref.shape[1] // S_CHUNK

    def body(c, carry):
        best, bchunk = carry  # (Q_TILE, S_CHUNK) each
        off = pl.multiple_of(c * S_CHUNK, S_CHUNK)
        sx = scene_ref[0:1, pl.ds(off, S_CHUNK)]
        sy = scene_ref[1:2, pl.ds(off, S_CHUNK)]
        sz = scene_ref[2:3, pl.ds(off, S_CHUNK)]
        ss = scene_ref[3:4, pl.ds(off, S_CHUNK)]
        score = ss - 2.0 * (qx * sx + qy * sy + qz * sz)
        better = score < best  # strict: earlier chunk keeps ties
        return jnp.where(better, score, best), jnp.where(better, c, bchunk)

    best0 = jnp.full((Q_TILE, S_CHUNK), BIG, jnp.float32)
    idx0 = jnp.zeros((Q_TILE, S_CHUNK), jnp.int32)
    best, bchunk = jax.lax.fori_loop(0, n_chunks, body, (best0, idx0))

    # one cross-lane reduction at the end: global index = bchunk*S_CHUNK + lane,
    # minimized over score-tied lanes -> smallest global index wins
    lane = jax.lax.broadcasted_iota(jnp.int32, (Q_TILE, S_CHUNK), 1)
    row_min = jnp.min(best, axis=1, keepdims=True)
    gidx = jnp.where(best == row_min, bchunk * S_CHUNK + lane, IBIG)
    idx_ref[...] = jnp.min(gidx, axis=1, keepdims=True)
    qq = q_ref[:, 3:4]
    dist_ref[...] = jnp.maximum(row_min + qq, 0.0)  # |q-s|^2, fp-cancel guarded


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_flash_packed(queries, scene_table, interpret: bool = False):
    """Exact NN against a pack_scene() table.

    queries (..., 3) -> (idx (...,) int32, dist_sq (...,) float32)."""
    q = jnp.asarray(queries, jnp.float32)
    flat = q.reshape(-1, 3)
    nq = flat.shape[0]
    qpad = (-nq) % Q_TILE
    qsq = jnp.sum(flat * flat, axis=-1, keepdims=True)
    qtab = jnp.concatenate([flat, qsq, jnp.zeros((nq, 4), jnp.float32)], axis=1)
    if qpad:
        qtab = jnp.concatenate([qtab, jnp.zeros((qpad, 8), jnp.float32)], axis=0)

    grid = (qtab.shape[0] // Q_TILE,)
    idx, dist = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (8, scene_table.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((Q_TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Q_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qtab.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((qtab.shape[0], 1), jnp.float32),
        ),
        interpret=interpret,
    )(scene_table, qtab)
    return idx[:nq, 0].reshape(q.shape[:-1]), dist[:nq, 0].reshape(q.shape[:-1])


def nn_flash(queries, scene_pts, interpret: bool = False):
    """Convenience wrapper packing the scene on the fly."""
    return nn_flash_packed(queries, pack_scene(scene_pts), interpret=interpret)


# ---------------------------------------------------------------- gated NN

GQ_TILE = 512  # queries per grid step for the gated kernel. Prune-rate
               # MODELING (scripts/nn_prune_rate.py) says smaller tiles have
               # tighter bboxes and prune more chunks (44-58% at T=128 vs
               # 15-28% at T=512), but WALL TIME on TPU says otherwise
               # (scripts/nn_kernel_rate.py, 524k real queries vs 26k pts,
               # dispatch amortized): T512 53.7-54.5 ms, T256 56.7-60.8,
               # T128 73.1-77.0. The 205-iteration scalar group loop (bbox
               # test per chunk per grid step) costs more per query at small
               # tiles than the extra pruning saves - the VLIW scalar core
               # issues ~1 box check while the VPU does ~1 chunk scan.
               # Versus gate-only (no tile bound): 2.7x (148-153 ms).
UB_BALL = 32   # scene points per upper-bound ball (pass 1). Finer balls
               # (radius ~4 mm vs ~10 mm at 128) tighten the per-tile NN
               # upper bound toward the oracle: conv-stage prune 46.5% ->
               # near-oracle (75.8%) territory for +5 lane-chunks of pass-1.
GSUB_TILE = None  # sub-tile pruning band (None = whole q_tile). Round-5
                  # hardware A/B (scripts/nn_tile_bound_study.py, 62k real
                  # queries vs the 26k-pt bench scene): every sub-tile
                  # variant LOSES to the plain T512/b32 bound (s256/s128/
                  # s64 at 42.0/42.2/45.1 ms vs 33.5; T1024/s128 38.7) -
                  # the per-band bound reductions + extra scalar work cost
                  # more than the tighter pruning saves, same failure mode
                  # as small tiles. REJECTED as default; the knob stays
                  # A/B-able (exactness pinned per-combination in
                  # tests/test_property.py).


def _kernel_gated(gate_ref, fid_ref, boxes_ref, cents_ref, scene_ref, q_ref,
                  idx_ref, dist_ref, best_ref, bchunk_ref, *, group: int,
                  q_tile: int = GQ_TILE, sub_tile: int | None = None,
                  use_tile_bound: bool = True,
                  n_chunks_pf: int = 0, n_groups_pf: int = 0,
                  n_cch_pf: int = 0):
    """Flash-NN with bbox pruning against the association gate AND a
    per-tile nearest-neighbor distance upper bound.

    The reference query accepts a neighbor only if dist^2 < max_dist_diff^2
    (pcd_scene.h:127), so a scene chunk whose bbox is farther than the gate
    from the whole query tile can never influence the ACCEPTED result -
    skipping it is exact at the Scene.query level. This is the TPU answer
    to the reference's kd-tree pruning (SURVEY step-5 fallback): work scales
    with the scene actually near the object, not total scene size, while
    control flow stays a predicated dense scan (no divergent traversal).

    The gate alone cannot prune an object-sized scene (a 0.1 m gate covers
    the whole object), so a cheap FIRST pass over per-chunk (center,
    radius) balls bounds every query's true NN distance from above:
    ub(q) = min_k |q - c_k| + r_k. Any chunk whose bbox lies farther than
    max_q min(ub(q), gate) from the tile cannot contain ANY tile query's
    in-gate nearest neighbor (the true NN of q sits at d(q) <= ub(q), so
    its chunk's bbox distance is <= d(q) <= the tile radius - ties
    included, so the kept index is unchanged). The pass costs ~n_chunks/128
    chunk-sized scans; the pruning it unlocks scales the main loop with the
    scene near the QUERY PATCH, not the scene inside the gate (VERDICT r3
    #8: the kd-query-side pruning the dense scan was missing).

    Boxes gate GROUPS of `group` chunks: SMEM scalars pad to 16 bytes each,
    so per-chunk boxes overflow the ~1 MB SMEM budget past ~2000 chunks
    (260k scene points) - nn_flash_gated picks the smallest group that
    fits. group == 1 for ordinary scenes (per-chunk pruning, unchanged).

    Stacked multi-frame scenes (SceneNNStack): every per-frame region of the
    stacked tables has the SAME static size (n_chunks_pf chunks,
    n_groups_pf box rows, n_cch_pf ball chunks), and fid_ref carries this
    query batch's frame id - all three loops below window to the frame's
    region, so a pose associates against ITS frame only (and the scan cost
    is one frame's, not the stack's). The single-frame case passes fid=0
    with per-frame sizes == totals, which reduces every offset to the
    original code path.

    sub_tile (static, divides q_tile; None = q_tile) prunes at SUB-tile
    granularity while keeping one grid step per q_tile queries: each
    sub_tile-row band gets its own bbox + NN-bound radius and its own
    pruned chunk scan over (sub_tile, S_CHUNK) blocks. Morton-ordered
    query clouds make small bands spatially tight, so this reaches the
    prune rate of a small query tile (44-58% at 128 vs 15-28% at 512,
    scripts/nn_prune_rate.py) WITHOUT paying a small tile's per-grid-step
    fixed costs (pass 1, output writes, grid overhead) - the round-4
    wall-time loss of GQ_TILE=128. Exactness argument is unchanged: a
    chunk skipped for band s has bbox distance > max_{q in s}
    min(ub(q), gate) >= the band's accepted-NN distances, ties included.
    """
    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    gate2 = gate_ref[0, 0]
    fid = fid_ref[0, 0]
    st = sub_tile or q_tile
    n_sub = q_tile // st

    # ---- pass 1: per-query NN-distance upper bound from chunk balls ----
    # (use_tile_bound=False falls back to gate-only pruning - the A/B
    # baseline for scripts/nn_tile_bound_study.py). Runs ONCE for the whole
    # q_tile; sub-tiles reduce their own rows below.
    if use_tile_bound:

        def ub_body(cc, ub):
            off = pl.multiple_of(cc * S_CHUNK, S_CHUNK)
            cx = cents_ref[0:1, pl.ds(off, S_CHUNK)]
            cy = cents_ref[1:2, pl.ds(off, S_CHUNK)]
            cz = cents_ref[2:3, pl.ds(off, S_CHUNK)]
            cr = cents_ref[3:4, pl.ds(off, S_CHUNK)]
            dx = qx - cx
            dy = qy - cy
            dz = qz - cz
            d = jnp.sqrt(dx * dx + dy * dy + dz * dz) + cr
            return jnp.minimum(ub, d)

        ub = jax.lax.fori_loop(
            fid * n_cch_pf, (fid + 1) * n_cch_pf, ub_body,
            jnp.full((q_tile, S_CHUNK), BIG, jnp.float32)
        )
        # per-query bound clamped to the gate BEFORE the band max: one
        # query with no nearby scene (it is invalid under the gate
        # regardless) must not widen the whole band's radius past the gate
        ub_q = jnp.minimum(jnp.min(ub, axis=1, keepdims=True), jnp.sqrt(gate2))

    best_ref[...] = jnp.full((q_tile, S_CHUNK), BIG, jnp.float32)
    bchunk_ref[...] = jnp.zeros((q_tile, S_CHUNK), jnp.int32)

    for s in range(n_sub):  # static unroll over sub-tile bands
        rs = slice(s * st, (s + 1) * st)
        bqx, bqy, bqz = qx[rs], qy[rs], qz[rs]
        # band bbox (padded query rows repeat a real query, so it is tight)
        qlo_x, qhi_x = jnp.min(q_ref[rs, 0]), jnp.max(q_ref[rs, 0])
        qlo_y, qhi_y = jnp.min(q_ref[rs, 1]), jnp.max(q_ref[rs, 1])
        qlo_z, qhi_z = jnp.min(q_ref[rs, 2]), jnp.max(q_ref[rs, 2])
        if use_tile_bound:
            tile_r = jnp.max(ub_q[rs])
            tile_r2 = tile_r * tile_r
        else:
            tile_r2 = gate2

        def body(g, _, bqx=bqx, bqy=bqy, bqz=bqz, rs=rs, tile_r2=tile_r2,
                 qlo_x=qlo_x, qhi_x=qhi_x, qlo_y=qlo_y, qhi_y=qhi_y,
                 qlo_z=qlo_z, qhi_z=qhi_z):
            dx = jnp.maximum(jnp.maximum(boxes_ref[g, 0] - qhi_x, qlo_x - boxes_ref[g, 4]), 0.0)
            dy = jnp.maximum(jnp.maximum(boxes_ref[g, 1] - qhi_y, qlo_y - boxes_ref[g, 5]), 0.0)
            dz = jnp.maximum(jnp.maximum(boxes_ref[g, 2] - qhi_z, qlo_z - boxes_ref[g, 6]), 0.0)
            reachable = dx * dx + dy * dy + dz * dz <= tile_r2

            @pl.when(reachable)
            def _():
                def chunk_body(c, _c):
                    off = pl.multiple_of(c * S_CHUNK, S_CHUNK)
                    sx = scene_ref[0:1, pl.ds(off, S_CHUNK)]
                    sy = scene_ref[1:2, pl.ds(off, S_CHUNK)]
                    sz = scene_ref[2:3, pl.ds(off, S_CHUNK)]
                    ss = scene_ref[3:4, pl.ds(off, S_CHUNK)]
                    score = ss - 2.0 * (bqx * sx + bqy * sy + bqz * sz)
                    cur = best_ref[rs, :]
                    better = score < cur  # strict: earlier chunk keeps ties
                    best_ref[rs, :] = jnp.where(better, score, cur)
                    bchunk_ref[rs, :] = jnp.where(better, c, bchunk_ref[rs, :])
                    return 0

                # box row g covers chunks [gl*group, gl*group+group) of frame
                # fid, whose chunk region starts at fid*n_chunks_pf
                gl = g - fid * n_groups_pf
                c0 = fid * n_chunks_pf + gl * group
                c1 = fid * n_chunks_pf + jnp.minimum(gl * group + group, n_chunks_pf)
                jax.lax.fori_loop(c0, c1, chunk_body, 0)

            return 0

        jax.lax.fori_loop(fid * n_groups_pf, (fid + 1) * n_groups_pf, body, 0)

    best = best_ref[...]
    bchunk = bchunk_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (q_tile, S_CHUNK), 1)
    row_min = jnp.min(best, axis=1, keepdims=True)
    gidx = jnp.where(best == row_min, bchunk * S_CHUNK + lane, IBIG)
    idx_ref[...] = jnp.minimum(jnp.min(gidx, axis=1, keepdims=True), IBIG - 1)
    qq = q_ref[:, 3:4]
    dist_ref[...] = jnp.where(
        row_min >= BIG, BIG, jnp.maximum(row_min + qq, 0.0)
    )


@functools.partial(jax.jit, static_argnames=(
    "interpret", "use_tile_bound", "q_tile", "sub_tile", "ub_ball",
    "_max_box_rows", "frames"))
def nn_flash_gated(queries, scene_table, boxes, max_dist,
                   interpret: bool = False, use_tile_bound: bool = True,
                   q_tile: int = GQ_TILE, sub_tile: int | None = GSUB_TILE,
                   ub_ball: int = UB_BALL,
                   _max_box_rows: int = 1024,
                   frame_id=None, frames: int = 1):
    """Gate-exact NN: identical to nn_flash_packed for every query whose true
    NN lies within max_dist; queries with no scene point inside the gate get
    dist_sq = BIG (invalid under the gate either way).

    queries (..., 3), scene_table from pack_scene, boxes from chunk_boxes,
    max_dist the association gate in meters (scalar, traced OK). q_tile
    (queries per grid step), sub_tile (pruning band within a grid step;
    None = whole tile) and ub_ball (scene points per pass-1 bounding
    ball; must divide S_CHUNK) trade pruning tightness against per-tile
    fixed costs - defaults picked by scripts/nn_tile_bound_study.py.

    Stacked multi-frame scenes: pass frames=K (static) with scene_table K
    per-frame pack_scene tables of EQUAL width concatenated on the lane
    axis, boxes their per-frame chunk_boxes stacked frame-major, and
    frame_id the (traced int32) frame this query batch associates against.
    The kernel windows every loop to the frame's region, so cost and
    result match a single-frame call on that frame's table alone - one
    program serves K heterogeneous scenes (SceneNNStack; vmapping over
    poses batches frame_id per pose).
    """
    if S_CHUNK % ub_ball:
        raise ValueError(f"ub_ball must divide S_CHUNK={S_CHUNK}, got {ub_ball}")
    if sub_tile is not None and (q_tile % sub_tile or sub_tile % 8):
        raise ValueError(
            f"sub_tile must divide q_tile={q_tile} and be a multiple of 8 "
            f"(f32 sublane), got {sub_tile}"
        )
    if scene_table.shape[1] % (frames * S_CHUNK):
        raise ValueError(
            f"stacked scene table width {scene_table.shape[1]} is not "
            f"{frames} equal per-frame multiples of S_CHUNK={S_CHUNK}"
        )
    if boxes.shape[0] * S_CHUNK != scene_table.shape[1]:
        # the windowed scan derives its chunk count from boxes alone: a
        # stale/mismatched box table would silently TRUNCATE the scene
        # scan (tail points never considered) instead of erroring
        raise ValueError(
            f"boxes rows {boxes.shape[0]} do not cover the scene table "
            f"({scene_table.shape[1]} cols / S_CHUNK={S_CHUNK} = "
            f"{scene_table.shape[1] // S_CHUNK} chunks) - were they built "
            "from this table?"
        )
    q = jnp.asarray(queries, jnp.float32)
    flat = q.reshape(-1, 3)
    nq = flat.shape[0]
    qpad = (-nq) % q_tile
    qsq = jnp.sum(flat * flat, axis=-1, keepdims=True)
    qtab = jnp.concatenate([flat, qsq, jnp.zeros((nq, 4), jnp.float32)], axis=1)
    if qpad:
        qtab = jnp.concatenate([qtab, jnp.broadcast_to(qtab[-1:], (qpad, 8))], axis=0)

    gate2 = jnp.reshape(
        jnp.asarray(max_dist, jnp.float32) * jnp.asarray(max_dist, jnp.float32),
        (1, 1),
    )
    # bounding BALLS for the kernel's NN-distance upper-bound pass, derived
    # from scene_table HERE rather than precomputed like flash_boxes: the
    # derivation is one scene-sized reshape/min/max chain (O(S), microseconds
    # next to the O(Q x S) scan it guards) and keeping it in-call lets the
    # ub_ball A/B knob vary without a scene rebuild. As an
    # (8, Nb_pad) VMEM table [cx, cy, cz, r] over ub_ball-point sub-chunks
    # of the (Morton/kd-ordered) scene table: center = sub-chunk bbox
    # center, r = half-diagonal (covers every point in it). Finer balls
    # bound each query's true NN distance much tighter than the 128-pt
    # chunk boxes (prune-rate study: radius ~4 mm vs ~10 mm). Scene-table
    # pad rows repeat the last real point, so their balls are radius-0 at a
    # REAL point - still a valid upper bound. Padded table lanes sit 1e18
    # away with r = 0 so they never lower the bound.
    sub = scene_table[:3].reshape(3, -1, ub_ball)  # (3, Nb, b)
    blo = sub.min(axis=2)
    bhi = sub.max(axis=2)
    ctr = (0.5 * (blo + bhi)).T  # (Nb, 3)
    rad = 0.5 * jnp.linalg.norm((bhi - blo).T, axis=1, keepdims=True)
    cents = jnp.concatenate(
        [ctr, rad, jnp.zeros((ctr.shape[0], 4), jnp.float32)], axis=1)
    # pad the ball table to an S_CHUNK multiple PER FRAME (frame regions
    # must share one static chunk count for the kernel's fid windowing);
    # frames == 1 keeps the original single tail pad
    nb_pf = cents.shape[0] // frames
    n_cch_pf = -(-nb_pf // S_CHUNK)
    cpad = n_cch_pf * S_CHUNK - nb_pf
    if cpad:
        far = jnp.concatenate(
            [jnp.full((frames, cpad, 3), 1.0e18), jnp.zeros((frames, cpad, 5))],
            axis=2,
        ).astype(jnp.float32)
        cents = jnp.concatenate(
            [cents.reshape(frames, nb_pf, 8), far], axis=1
        ).reshape(frames * n_cch_pf * S_CHUNK, 8)
    cents = cents.T  # (8, frames * n_cch_pf * S_CHUNK)
    # SMEM scalars pad to 16 B each; keep the box table <= ~1024 rows by
    # gating GROUPS of chunks for very large scenes (group 1 = per-chunk;
    # _max_box_rows is only lowered by tests to cover the merge path).
    # Grouping is per frame so every frame spans the same static row count.
    n_chunks = boxes.shape[0]
    n_chunks_pf = n_chunks // frames
    group = -(-n_chunks_pf // max(_max_box_rows // frames, 1))
    n_groups_pf = -(-n_chunks_pf // group)
    if group > 1:
        pad = n_groups_pf * group - n_chunks_pf
        b = boxes.reshape(frames, n_chunks_pf, 8)
        if pad:
            empty = jnp.concatenate(
                [jnp.full((frames, pad, 3), BIG), jnp.zeros((frames, pad, 1)),
                 jnp.full((frames, pad, 3), -BIG), jnp.zeros((frames, pad, 1))],
                axis=2,
            ).astype(jnp.float32)
            b = jnp.concatenate([b, empty], axis=1)
        b = b.reshape(frames * n_groups_pf, group, 8)
        boxes = jnp.concatenate(
            [b[..., :4].min(axis=1), b[..., 4:].max(axis=1)], axis=1
        )
    fid = jnp.reshape(
        jnp.zeros((), jnp.int32) if frame_id is None
        else jnp.asarray(frame_id, jnp.int32), (1, 1))
    grid = (qtab.shape[0] // q_tile,)
    idx, dist = pl.pallas_call(
        functools.partial(_kernel_gated, group=group, q_tile=q_tile,
                          sub_tile=sub_tile, use_tile_bound=use_tile_bound,
                          n_chunks_pf=n_chunks_pf, n_groups_pf=n_groups_pf,
                          n_cch_pf=n_cch_pf),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (boxes.shape[0], 8), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (8, cents.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, scene_table.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((q_tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qtab.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((qtab.shape[0], 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((q_tile, S_CHUNK), jnp.float32),
            pltpu.VMEM((q_tile, S_CHUNK), jnp.int32),
        ],
        interpret=interpret,
    )(gate2, fid, boxes, cents, scene_table, qtab)
    return idx[:nq, 0].reshape(q.shape[:-1]), dist[:nq, 0].reshape(q.shape[:-1])
