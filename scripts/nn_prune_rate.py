"""Chunk-prune-rate analysis for the gated flash-NN kernel (pure numpy).

The tile-bound pass (nn_pallas._kernel_gated) prunes a scene chunk when its
bbox lies farther from the QUERY TILE's bbox than the tile's NN-distance
upper bound. This script replays that exact geometry on the bench
workload's real distribution (raw 26k-pt scene, per-pose lifted clouds,
Morton order, GQ_TILE grouping) WITHOUT the TPU: it reports, per ICP stage
(initial perturbation / half-converged / converged), the fraction of
(tile, chunk) scans the bound eliminates - the kernel's best-case speedup
is 1 / (1 - prune_rate) on the chunk loop.

It also models the levers:
  - tile size (GQ_TILE 512 vs 256 vs 128): smaller tiles = tighter bboxes
    and tighter tile_r, more pruning, but more grid steps + more pass-1.
  - per-chunk vs grouped boxes.
  - an oracle bound (true NN distance instead of the ball upper bound):
    how much of the gap is bound looseness vs tile geometry.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/nn_prune_rate.py
(CPU-only by construction - forces jax_platforms=cpu before import.)
"""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
import jax.numpy as jnp

from pose_refine_tpu import geometry, mesh
import pose_refine_tpu as prt
from pose_refine_tpu.ops.depth_to_cloud import window_cloud
from pose_refine_tpu.scene.nn import SceneNN

S_CHUNK = 128
GATE = 0.1  # meters, the production association gate


def _morton_xyz(p, bits=10):
    q = ((p - p.min(0)) / max(np.ptp(p, 0).max(), 1e-9)
         * ((1 << bits) - 1)).astype(np.uint64)
    code = np.zeros(len(p), np.uint64)
    for b in range(bits):
        for a in range(3):
            code |= ((q[:, a] >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b + a)
    return code


def chunk_stats(sc, chunk=S_CHUNK):
    ns = len(sc)
    pad = (-ns) % chunk
    if pad:
        sc = np.concatenate([sc, np.repeat(sc[-1:], pad, 0)], 0)
    c = sc.reshape(-1, chunk, 3)
    lo, hi = c.min(1), c.max(1)
    ctr = 0.5 * (lo + hi)
    rad = 0.5 * np.linalg.norm(hi - lo, axis=1)
    return lo, hi, ctr, rad, c


def bbox_dist2(qlo, qhi, lo, hi):
    """(T,3)x(T,3) tile boxes vs (C,3)x(C,3) chunk boxes -> (T,C) dist^2."""
    d = np.maximum(np.maximum(lo[None] - qhi[:, None], qlo[:, None] - hi[None]), 0.0)
    return (d * d).sum(-1)


def analyze(queries_per_pose, sc, tile_sizes=(512, 256, 128),
            ball_sizes=(S_CHUNK, 32), tag=""):
    from scipy.spatial import cKDTree

    lo, hi, ctr, rad, chunks = chunk_stats(sc)
    n_chunks = len(lo)
    tree = cKDTree(chunks.reshape(-1, 3))
    balls = {b: chunk_stats(sc, b)[2:4] for b in ball_sizes}
    for T in tile_sizes:
        total = 0
        pruned = {b: 0 for b in ball_sizes}
        pruned_oracle = 0
        tile_rs = {b: [] for b in ball_sizes}
        for q in queries_per_pose:
            # Morton-order within the pose, exactly like the production lift
            q = q[np.argsort(_morton_xyz(q))]
            npad = (-len(q)) % T
            if npad:
                q = np.concatenate([q, np.repeat(q[-1:], npad, 0)], 0)
            tiles = q.reshape(-1, T, 3)
            qlo, qhi = tiles.min(1), tiles.max(1)
            d2 = bbox_dist2(qlo, qhi, lo, hi)
            total += d2.size
            for b, (bc, br) in balls.items():
                # ball upper bound per query: min_k |q-c_k| + r_k, clamp gate
                d_ctr = np.linalg.norm(
                    tiles[:, :, None] - bc[None, None], axis=-1)
                ub = np.minimum((d_ctr + br[None, None]).min(-1), GATE)
                tile_r = ub.max(1)  # (T_tiles,)
                tile_rs[b].append(tile_r)
                pruned[b] += (d2 > (tile_r ** 2)[:, None]).sum()
            # oracle: true NN distance (what a perfect bound would give)
            d_true = tree.query(tiles.reshape(-1, 3), k=1)[0].reshape(tiles.shape[:2])
            tile_r_o = np.minimum(d_true, GATE).max(1)
            pruned_oracle += (d2 > (tile_r_o ** 2)[:, None]).sum()
        for b in ball_sizes:
            trs = np.concatenate(tile_rs[b])
            print(f"  {tag} T={T:4d} ball={b:3d}: prune {pruned[b]/total*100:5.1f}% "
                  f"(oracle {pruned_oracle/total*100:5.1f}%) | "
                  f"tile_r mm p50/p90/max {np.percentile(trs,50)*1e3:5.1f}/"
                  f"{np.percentile(trs,90)*1e3:5.1f}/{trs.max()*1e3:5.1f} | "
                  f"chunks {n_chunks}")


def main():
    model = mesh.load_benchmark_model()
    K = geometry.LINEMOD_K.copy()
    W, H = 640, 480
    R_ren = np.array([[0.34768538, 0.93761126, 0.0],
                      [0.70540612, -0.26157897, -0.65877056],
                      [-0.61767070, 0.22904489, -0.75234390]], np.float32)
    truth = np.asarray(geometry.pose_from_Rt(
        R_ren, np.array([0, 0, 300], np.float32)))
    rng = np.random.default_rng(0)
    N = 16  # poses sampled from the bench distribution (enough tiles to average)
    d_rot = np.asarray(geometry.euler_to_rotation(
        rng.uniform(-0.17, 0.17, (N, 3)).astype(np.float32)))
    poses0 = np.asarray(geometry.pose_from_Rt(
        jnp.einsum("nij,jk->nik", d_rot, truth[:3, :3]),
        truth[:3, 3] + rng.uniform(-20, 20, (N, 3)).astype(np.float32)))

    r = prt.PoseRenderer(model, K=K, width=W, height=H, backend="dense")
    scene_depth = np.asarray(r.render_depth(truth))[0].astype(np.int32)
    scene_host = SceneNN.from_depth(scene_depth, K, backend="bruteforce")
    sc = np.asarray(scene_host.points)
    print(f"scene: {len(sc)} pts -> {-(-len(sc)//S_CHUNK)} chunks "
          f"(kd/Morton ordered: {scene_host.points.shape})")

    def lift(pose_batch):
        out = []
        for p in pose_batch:
            d = np.asarray(r.render_depth(p[None]))[0].astype(np.int32)
            qc, qv, _ = window_cloud(jnp.asarray(d), K, window=256, stride=2)
            q = np.asarray(qc)[np.asarray(qv)]
            # production budget: 2048 points
            if len(q) > 2048:
                q = q[rng.choice(len(q), 2048, replace=False)]
            out.append(q)
        return out

    print("ICP stage: INITIAL perturbation (±10deg, ±20mm)")
    analyze(lift(poses0), sc, tag="init ")
    # half-converged: blend poses toward truth (interpolate translation,
    # slerp-ish via halving the euler offset)
    d_rot_h = np.asarray(geometry.euler_to_rotation(
        (rng.uniform(-0.17, 0.17, (N, 3)) * 0.25).astype(np.float32)))
    poses_h = np.asarray(geometry.pose_from_Rt(
        jnp.einsum("nij,jk->nik", d_rot_h, truth[:3, :3]),
        truth[:3, 3] + rng.uniform(-5, 5, (N, 3)).astype(np.float32)))
    print("ICP stage: NEAR-CONVERGED (±2.5deg, ±5mm)")
    analyze(lift(poses_h), sc, tag="near ")
    print("ICP stage: CONVERGED (truth poses)")
    analyze(lift(np.repeat(truth[None], 4, 0)), sc, tag="conv ")


if __name__ == "__main__":
    main()
