"""Probe: flash-NN scoring on the MXU instead of the VPU.

score(q, s) = |s|^2 - 2 q.s = [1, qx, qy, qz] @ [ss, -2sx, -2sy, -2sz]^T -
one (Q_TILE, 4) x (4, S_CHUNK) matmul per chunk. Min-tracking stays VPU.
Measures rate vs the elementwise kernel at bench scale and checks idx
agreement on a real depth-cloud workload (structured data is where ulp-level
score differences could flip argmin ties).
"""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from pose_refine_tpu.utils.timer import time_jitted
from pose_refine_tpu.scene.nn_pallas import pack_scene, nn_flash_packed, Q_TILE, S_CHUNK, BIG, IBIG

rng = np.random.default_rng(0)


def pack_scene_mxu(scene_pts):
    """rows 0-2: x,y,z; row 3: |s|^2; rows 4-6: -2x,-2y,-2z; row 7: 0."""
    t = np.array(pack_scene(scene_pts), copy=True)
    t[4:7] = -2.0 * t[0:3]
    return jnp.asarray(t)


def _kernel_mxu(scene_ref, q_ref, idx_ref, dist_ref):
    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    ones = jnp.ones((Q_TILE, 1), jnp.float32)
    A = jnp.concatenate([ones, qx, qy, qz], axis=1)  # (Q_TILE, 4)
    n_chunks = scene_ref.shape[1] // S_CHUNK

    def body(c, carry):
        best, bchunk = carry
        off = pl.multiple_of(c * S_CHUNK, S_CHUNK)
        B = scene_ref[3:7, pl.ds(off, S_CHUNK)]  # [ss, -2x, -2y, -2z]
        score = jax.lax.dot(A, B, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        better = score < best
        return jnp.where(better, score, best), jnp.where(better, c, bchunk)

    best0 = jnp.full((Q_TILE, S_CHUNK), BIG, jnp.float32)
    idx0 = jnp.zeros((Q_TILE, S_CHUNK), jnp.int32)
    best, bchunk = jax.lax.fori_loop(0, n_chunks, body, (best0, idx0))
    lane = jax.lax.broadcasted_iota(jnp.int32, (Q_TILE, S_CHUNK), 1)
    row_min = jnp.min(best, axis=1, keepdims=True)
    gidx = jnp.where(best == row_min, bchunk * S_CHUNK + lane, IBIG)
    idx_ref[...] = jnp.min(gidx, axis=1, keepdims=True)
    qq = q_ref[:, 3:4]
    dist_ref[...] = jnp.maximum(row_min + qq, 0.0)


@functools.partial(jax.jit, static_argnames=())
def nn_flash_mxu(queries, scene_table):
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
        _kernel_mxu,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, scene_table.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
    )(scene_table, qtab)
    return idx[:nq, 0].reshape(q.shape[:-1]), dist[:nq, 0].reshape(q.shape[:-1])


# real depth-cloud workload
import pose_refine_tpu as prt
from pose_refine_tpu import geometry, mesh
from pose_refine_tpu.ops.rasterize_pallas import rasterize_pallas
from pose_refine_tpu.ops.depth_to_cloud import depth_image_to_points
from pose_refine_tpu.utils.sync import sync

model = mesh.load_benchmark_model()
tris = jnp.asarray(model.tris[mesh.morton_order(model.tris)])
K = geometry.LINEMOD_K
proj = geometry.compute_proj(K, 640, 480)
R1 = np.array([[0.34768538, 0.93761126, 0.0],[0.70540612, -0.26157897, -0.65877056],[-0.61767070, 0.22904489, -0.75234390]], np.float32)
truth = np.asarray(geometry.pose_from_Rt(R1, np.array([0,0,300], np.float32)))
depth = np.asarray(sync(rasterize_pallas(tris, jnp.asarray(truth)[None], 640, 480, proj)))[0]
pts, mask = depth_image_to_points(depth, K)
obj = np.asarray(pts).reshape(-1,3)[np.asarray(mask).reshape(-1)]
obj = obj[np.lexsort((obj[:,0], obj[:,1], obj[:,2]))]

NQ = 262144
Q = jnp.asarray(obj[rng.choice(len(obj), NQ, replace=True)] + rng.normal(0, 0.003, (NQ,3)).astype(np.float32))
t_plain_tab = jax.device_put(pack_scene(obj))
t_mxu_tab = jax.device_put(pack_scene_mxu(obj))

t0 = time_jitted(lambda q: nn_flash_packed(q, t_plain_tab), Q, iters=5)
t1 = time_jitted(lambda q: nn_flash_mxu(q, t_mxu_tab), Q, iters=5)
i0, d0 = nn_flash_packed(Q, t_plain_tab)
i1, d1 = nn_flash_mxu(Q, t_mxu_tab)
i0, i1, d0, d1 = map(np.asarray, (i0, i1, d0, d1))
agree = (i0 == i1).mean()
dmax = np.abs(d0 - d1).max()
print(f"VPU kernel: {t0*1000:7.2f} ms   MXU kernel: {t1*1000:7.2f} ms   speedup {t0/t1:4.2f}x")
print(f"idx agreement: {agree*100:.4f}%   max |dist diff|: {dmax:.3e}")
mism = np.nonzero(i0 != i1)[0]
if len(mism):
    j = mism[0]
    print("example mismatch:", i0[j], i1[j], d0[j], d1[j],
          "true dists:", np.sum((obj[i0[j]]-np.asarray(Q)[j])**2), np.sum((obj[i1[j]]-np.asarray(Q)[j])**2))
