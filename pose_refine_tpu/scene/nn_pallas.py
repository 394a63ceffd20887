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
    Padded entries carry |s|^2 = BIG so they never win the min."""
    s = jnp.asarray(scene_pts, jnp.float32)
    ns = s.shape[0]
    spad = (-ns) % S_CHUNK
    ssq = jnp.sum(s * s, axis=-1, keepdims=True)
    stab = jnp.concatenate([s, ssq, jnp.zeros((ns, 4), jnp.float32)], axis=1)
    if spad:
        pad_rows = jnp.concatenate(
            [jnp.zeros((spad, 3), jnp.float32),
             jnp.full((spad, 1), BIG, jnp.float32),
             jnp.zeros((spad, 4), jnp.float32)],
            axis=1,
        )
        stab = jnp.concatenate([stab, pad_rows], axis=0)
    return stab.T  # (8, S_pad)


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
