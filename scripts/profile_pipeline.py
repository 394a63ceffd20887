import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np, time
import pose_refine_tpu as prt
from pose_refine_tpu import geometry, icp, mesh
from pose_refine_tpu.ops.rasterize_pallas import rasterize_pallas
from pose_refine_tpu.ops.depth_to_cloud import compact_points, depth_image_to_points
from pose_refine_tpu.scene.projective import SceneProjective
from pose_refine_tpu.utils.timer import time_jitted
from pose_refine_tpu.utils.sync import sync

W, H, N, MP = 640, 480, 256, 32768
model = mesh.load_benchmark_model()
tris = jnp.asarray(model.tris[mesh.morton_order(model.tris)])
K = geometry.LINEMOD_K
proj = geometry.compute_proj(K, W, H)
R1 = np.array([[0.34768538, 0.93761126, 0.0],[0.70540612, -0.26157897, -0.65877056],[-0.61767070, 0.22904489, -0.75234390]], np.float32)
truth = np.asarray(geometry.pose_from_Rt(R1, np.array([0,0,300], np.float32)))
rng = np.random.default_rng(0)
d_rot = np.asarray(geometry.euler_to_rotation(rng.uniform(-0.17,0.17,(N,3)).astype(np.float32)))
poses = np.asarray(geometry.pose_from_Rt(jnp.einsum('nij,jk->nik', d_rot, truth[:3,:3]), truth[:3,3] + rng.uniform(-20,20,(N,3)).astype(np.float32)))
poses = jax.device_put(jnp.asarray(poses))

scene_depth = np.asarray(sync(rasterize_pallas(tris, jnp.asarray(truth)[None], W, H, proj)))[0]
scene = jax.tree.map(jax.device_put, SceneProjective.from_depth(scene_depth, K))

r = jax.jit(lambda t, p: rasterize_pallas(t, p, W, H, proj))
print(f"render 256:      {time_jitted(r, tris, poses, iters=3)*1000:8.1f} ms", flush=True)
depth = sync(r(tris, poses))

@jax.jit
def lift(depth):
    def one(d):
        pts, mask = depth_image_to_points(d, jnp.asarray(K))
        return compact_points(pts, mask, MP)
    return jax.vmap(one)(depth)
print(f"lift 256:        {time_jitted(lift, depth, iters=3)*1000:8.1f} ms", flush=True)
clouds, valids, _ = lift(depth)
clouds, valids = sync((clouds, valids))

@jax.jit
def run_icp(clouds, valids, scene):
    def one(c, v):
        return icp.icp_point_to_plane(c, v, scene.query)
    return jax.vmap(one)(clouds, valids)
print(f"icp 256x32768:   {time_jitted(run_icp, clouds, valids, scene, iters=3)*1000:8.1f} ms", flush=True)

# ICP with smaller budgets
for mp in (16384, 8192):
    c2, v2 = clouds[:, :mp], valids[:, :mp]
    print(f"icp 256x{mp}:   {time_jitted(run_icp, c2, v2, scene, iters=3)*1000:8.1f} ms", flush=True)

# scene init cost (steady)
sd = jnp.asarray(scene_depth)
si = jax.jit(lambda d: SceneProjective.from_depth(d, jnp.asarray(K)).table)
print(f"scene init:      {time_jitted(si, sd, iters=3)*1000:8.1f} ms", flush=True)
