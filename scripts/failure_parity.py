"""Do the hypotheses our pipeline fails to recover also fail under the
reference algorithm (C++ baseline)? If yes, the 'recovered<3deg' ceiling is
the ICP convergence basin, not an implementation defect."""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
import pose_refine_tpu as prt
from pose_refine_tpu import geometry, mesh, native
from pose_refine_tpu.ops.rasterize_pallas import rasterize_pallas
from pose_refine_tpu.ops.depth_to_cloud import depth_to_cloud
from pose_refine_tpu.utils.sync import sync

W, H, N = 640, 480, 64
model = mesh.load_benchmark_model()
tris = jnp.asarray(model.tris[mesh.morton_order(model.tris)])
K = geometry.LINEMOD_K
proj = geometry.compute_proj(K, W, H)
R1 = np.array([[0.34768538, 0.93761126, 0.0],[0.70540612, -0.26157897, -0.65877056],[-0.61767070, 0.22904489, -0.75234390]], np.float32)
truth = np.asarray(geometry.pose_from_Rt(R1, np.array([0,0,300], np.float32)))
rng = np.random.default_rng(0)
d_rot = np.asarray(geometry.euler_to_rotation(rng.uniform(-0.17,0.17,(N,3)).astype(np.float32)))
poses = np.asarray(geometry.pose_from_Rt(jnp.einsum('nij,jk->nik', d_rot, truth[:3,:3]), truth[:3,3] + rng.uniform(-20,20,(N,3)).astype(np.float32)))

scene_depth = np.asarray(sync(rasterize_pallas(tris, jnp.asarray(truth)[None], W, H, proj)))[0]
refiner = prt.PoseRefiner(model, K=K, width=W, height=H, max_points=8192)
refiner.set_scene_depth(scene_depth)
refined, res = refiner.refine(jax.device_put(jnp.asarray(poses)))
refined = np.asarray(sync(refined))

def rot_err_deg(T):
    Rr = T[:3, :3] @ truth[:3, :3].T
    return np.degrees(np.arccos(np.clip((np.trace(Rr) - 1) / 2, -1, 1)))

tpu_err = np.array([rot_err_deg(refined[i]) for i in range(N)])

# CPU baseline on the same 64 hypotheses
dep_cc = native.cpu_render_baseline(np.asarray(tris), poses, np.asarray(proj), W, H)
scene_p = refiner.scene
clouds, valids = [], []
for i in range(N):
    c, v, _ = depth_to_cloud(dep_cc[i], K, max_points=32768)
    clouds.append(np.asarray(c)); valids.append(np.asarray(v))
T_cc, fit_cc, _ = native.cpu_icp_baseline(
    np.stack(clouds), np.stack(valids), np.asarray(scene_p.pcd), np.asarray(scene_p.normal), K)
cpu_refined = T_cc.copy()
cpu_refined[:, :3, 3] *= 1000.0
cpu_final = np.einsum("nij,njk->nik", cpu_refined, poses)
cpu_err = np.array([rot_err_deg(cpu_final[i]) for i in range(N)])

tpu_ok = tpu_err < 3.0
cpu_ok = cpu_err < 3.0
print(f"TPU recovered: {tpu_ok.mean()*100:.0f}%   CPU-reference recovered: {cpu_ok.mean()*100:.0f}%")
print(f"agreement (same verdict): {(tpu_ok == cpu_ok).mean()*100:.0f}%")
bad = np.nonzero(~tpu_ok)[0]
print("TPU-failed cases:", bad.tolist())
print("  their CPU errors (deg):", np.round(cpu_err[bad], 2).tolist())
print("  their init rotation magnitudes (deg):",
      np.round([rot_err_deg(poses[i]) for i in bad], 1).tolist())

# does the coarse-to-fine schedule rescue any of the shared failures?
sched_refined, _ = refiner.refine(
    jax.device_put(jnp.asarray(poses)), schedule=[(0.3, 15), (0.1, 20), (0.05, 10)]
)
sched_refined = np.asarray(sync(sched_refined))
sched_err = np.array([rot_err_deg(sched_refined[i]) for i in range(N)])
print(f"with schedule: recovered {np.mean(sched_err < 3.0)*100:.0f}%  "
      f"(failed cases now: {np.round(sched_err[bad], 1).tolist()})")
