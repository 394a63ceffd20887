"""Gated vs plain flash-NN: speed on the bench workload + crossover vs
scene size (VERDICT r1 item 5). The gated kernel's win grows with scene
size because pruning removes chunks farther than the association gate from
each query tile; plain flash is O(Q*S) regardless.

Synthetic large scenes: the obj_06 view plus a background wall of
increasing extent (the production case: cluttered scenes where the object
is a small part of the depth image).
"""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
import pose_refine_tpu as prt
from pose_refine_tpu import geometry, mesh
from pose_refine_tpu.ops.rasterize_pallas import rasterize_pallas
from pose_refine_tpu.scene.nn_pallas import chunk_boxes, nn_flash_gated, nn_flash_packed, pack_scene
from pose_refine_tpu.utils.metrics import rotation_angle_deg
from pose_refine_tpu.utils.sync import sync
from pose_refine_tpu.utils.timer import time_jitted

W, H = 640, 480
model = mesh.load_benchmark_model()
tris = jnp.asarray(model.tris[mesh.morton_order(model.tris)])
K = geometry.LINEMOD_K
proj = geometry.compute_proj(K, W, H)
R1 = np.array([[0.34768538, 0.93761126, 0.0],
               [0.70540612, -0.26157897, -0.65877056],
               [-0.61767070, 0.22904489, -0.75234390]], np.float32)
truth = np.asarray(geometry.pose_from_Rt(R1, np.array([0, 0, 300], np.float32)))
scene_depth = np.asarray(sync(rasterize_pallas(tris, jnp.asarray(truth)[None], W, H, proj)))[0]

# ---- raw kernel crossover: obj scene + growing background shell ----
rng = np.random.default_rng(0)
from pose_refine_tpu.ops.depth_to_cloud import depth_image_to_points
obj_pts, obj_mask = depth_image_to_points(scene_depth, K)
obj = np.asarray(obj_pts).reshape(-1, 3)[np.asarray(obj_mask).reshape(-1)]
# 256k queries per call (64 poses' worth of 4096-pt clouds): big enough to
# amortize the ~28 ms tunnel dispatch that swamps single-pose-size calls
NQ = 262144
Q = jnp.asarray(obj[rng.choice(len(obj), NQ, replace=True)]
                + rng.normal(0, 0.003, (NQ, 3)).astype(np.float32))

print(f"object cloud: {len(obj)} pts")
for extra in (0, 25_000, 75_000, 175_000):
    if extra:
        # background wall 0.5-1.5 m behind, spread over a growing area
        span = 0.3 + 1.2 * extra / 175_000
        bg = np.stack([
            rng.uniform(-span, span, extra),
            rng.uniform(-span, span, extra),
            rng.uniform(0.5, 1.5, extra),
        ], axis=1).astype(np.float32)
        pts = np.concatenate([obj, bg])
    else:
        pts = obj
    pts = pts[np.lexsort((pts[:, 0], pts[:, 1], pts[:, 2]))]
    table = jax.device_put(pack_scene(pts))
    boxes = jax.device_put(chunk_boxes(table))

    t_plain = time_jitted(lambda q: nn_flash_packed(q, table), Q, iters=3)
    t_gated = time_jitted(lambda q: nn_flash_gated(q, table, boxes, 0.1), Q, iters=3)
    i0, d0 = nn_flash_packed(Q, table)
    i1, d1 = nn_flash_gated(Q, table, boxes, 0.1)
    inside = np.asarray(d0) < 0.01
    ok = (np.asarray(i0)[inside] == np.asarray(i1)[inside]).all()
    print(f"S={len(pts):7d}: plain {t_plain*1000:7.2f} ms  gated {t_gated*1000:7.2f} ms  "
          f"speedup {t_plain/t_gated:4.1f}x  exact-in-gate {ok}", flush=True)

# ---- full NN pipeline (production config: 2048-pt clouds, 4 mm render
# decimation, 2 mm scene voxels - matches the bench NN metric) ----
N = 256
d_rot = np.asarray(geometry.euler_to_rotation(rng.uniform(-0.17, 0.17, (N, 3)).astype(np.float32)))
poses = np.asarray(geometry.pose_from_Rt(
    jnp.einsum("nij,jk->nik", d_rot, truth[:3, :3]),
    truth[:3, 3] + rng.uniform(-20, 20, (N, 3)).astype(np.float32)))
refiner = prt.PoseRefiner(model, K=K, width=W, height=H, scene="nn_bruteforce",
                          render_scale=2, max_points=2048, window=128, stride=2,
                          chunk_iters=64, decimate_mm=4.0, scene_voxel_mm=2.0)
refiner.set_scene_depth(scene_depth)
poses_j = jax.device_put(jnp.asarray(poses))
r, res = refiner.refine(poses_j); sync((r,))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    r, res = refiner.refine(poses_j); sync((r,))
    ts.append(time.perf_counter() - t0)
t = sorted(ts)[1]
rot = rotation_angle_deg(np.asarray(r), truth)
print(f"NN pipeline batch-{N} (gated): {t*1000:.0f} ms -> {N/t:.0f} poses/s, "
      f"recovered {np.mean(rot < 3)*100:.0f}%, fit {float(np.asarray(res.fitness).mean()):.3f}")
