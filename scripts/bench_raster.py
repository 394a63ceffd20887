import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, time
import pose_refine_tpu as prt
from pose_refine_tpu import mesh
from pose_refine_tpu.ops.rasterize_pallas import rasterize_pallas
import pose_refine_tpu.ops.rasterize as R

print("platform:", jax.default_backend(), flush=True)
model = prt.Model.load("/root/reference/test/obj_06.ply", verbose=False)
tris = model.tris[mesh.morton_order(model.tris)]
K = prt.LINEMOD_K
proj = prt.compute_proj(K, 640, 480)
R1 = np.array([[0.34768538, 0.93761126, 0.0],[0.70540612, -0.26157897, -0.65877056],[-0.61767070, 0.22904489, -0.75234390]], np.float32)
rng = np.random.default_rng(1)
jit_ang = rng.uniform(-0.05, 0.05, (100,3)).astype(np.float32)
rots = np.asarray(prt.geometry.euler_to_rotation(jit_ang))
poses = np.stack([np.asarray(prt.geometry.pose_from_Rt(rots[i] @ R1, np.array([0,0,300],np.float32))) for i in range(100)])

t0 = time.perf_counter()
out = jax.block_until_ready(rasterize_pallas(tris, poses, 640, 480, proj))
print(f"pallas compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(5):
    out = jax.block_until_ready(rasterize_pallas(tris, poses, 640, 480, proj))
dt = (time.perf_counter()-t0)/5
print(f"pallas steady: {dt*1000:.1f} ms for 100 poses -> {100/dt:.0f} poses/sec", flush=True)

roi = (160, 80, 320, 240)
t0 = time.perf_counter()
got = np.asarray(rasterize_pallas(tris, poses[:2], 640, 480, proj, roi=roi))
print(f"pallas roi compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
want = np.asarray(R.rasterize_dense(tris, poses[:2], 640, 480, proj, roi=roi))
diff = (got != want)
print("ROI mismatched pixels:", int(diff.sum()), "/", diff.size, flush=True)
full = np.asarray(rasterize_pallas(tris, poses[:2], 640, 480, proj))
print("ROI == full crop:", np.array_equal(got, full[:, 80:320, 160:480]), flush=True)
print("coverage:", (full[0]>0).mean(), "depth range", full[0][full[0]>0].min(), full[0][full[0]>0].max(), flush=True)
print("DONE", flush=True)
