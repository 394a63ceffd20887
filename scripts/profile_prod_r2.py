"""Stage split of the CURRENT production pipeline (r2 end state).

Times each stage as its own dispatch (each carries ~28-30 ms tunnel
overhead - subtract the measured null-dispatch to compare against the
fused total) at the production config: render_scale=2, decimate_mm=2,
window 128 / stride 2, top_k 2048, 31 fused ICP iters.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

import pose_refine_tpu as prt
from pose_refine_tpu import geometry, icp, mesh
from pose_refine_tpu.ops.depth_to_cloud import compact_topk, window_cloud_batched
from pose_refine_tpu.ops.rasterize_pallas import rasterize_pallas
from pose_refine_tpu.utils.sync import sync

W, H, N = 640, 480, 256
model = mesh.load_benchmark_model()
dec = mesh.simplify_vertex_clustering(model, 2.0)
tris_full = jnp.asarray(model.tris[mesh.morton_order(model.tris)])
tris = jnp.asarray(dec.tris[mesh.morton_order(dec.tris)])
K = geometry.LINEMOD_K
proj = geometry.compute_proj(K, W, H)
R1 = np.array([[0.34768538, 0.93761126, 0.0],
               [0.70540612, -0.26157897, -0.65877056],
               [-0.61767070, 0.22904489, -0.75234390]], np.float32)
truth = np.asarray(geometry.pose_from_Rt(R1, np.array([0, 0, 300], np.float32)))
rng = np.random.default_rng(0)
d_rot = np.asarray(geometry.euler_to_rotation(rng.uniform(-0.17, 0.17, (N, 3)).astype(np.float32)))
poses = jax.device_put(jnp.asarray(np.asarray(geometry.pose_from_Rt(
    jnp.einsum("nij,jk->nik", d_rot, truth[:3, :3]),
    truth[:3, 3] + rng.uniform(-20, 20, (N, 3)).astype(np.float32)))))
scene_depth = np.asarray(sync(rasterize_pallas(tris_full, jnp.asarray(truth)[None], W, H, proj)))[0]

refiner = prt.PoseRefiner(model, K=K, width=W, height=H, render_scale=2,
                          chunk_iters=64, window=128, stride=2, max_points=2048,
                          decimate_mm=2.0)
refiner.set_scene_depth(scene_depth)
scene = refiner.scene
roi = refiner.roi
K2 = jnp.asarray(refiner.K_render)
proj2 = refiner.proj
rw, rh = refiner.render_w, refiner.render_h


def timeit(name, fn, *args):
    out = sync(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:32s} {sorted(ts)[2]*1000:7.1f} ms", flush=True)
    return out


timeit("null dispatch (1-elem add)", jax.jit(lambda x: x + 1), jnp.zeros(()))
depth = timeit("render 256 (decim, rs=2, roi)",
               jax.jit(lambda t, p: rasterize_pallas(t, p, rw, rh, proj2, roi=roi,
                                                     variant="tile16")), tris, poses)


@jax.jit
def lift(depth):
    clouds, valids, _ = window_cloud_batched(depth, K2, window=128, stride=2,
                                             tl_x=roi[0], tl_y=roi[1])
    return jax.vmap(lambda p, v: compact_topk(p, v, 2048))(clouds, valids)


clouds, valids, _ = timeit("lift+topk 256", lift, depth)


@jax.jit
def run_icp(clouds, valids):
    def one(c, v):
        return icp.icp_point_to_plane(c, v, scene.query,
                                      icp.ICPConvergenceCriteria(), chunk_iters=64)
    return jax.vmap(one)(clouds, valids)


timeit("icp 256 x 2048 x 31", run_icp, clouds, valids)
timeit("FUSED full pipeline", lambda p: refiner.refine(p)[0], poses)
