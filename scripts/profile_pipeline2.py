"""Stage-level breakdown of the round-2 production pipeline (340 ms batch
256): where does the remaining wall go? Times each stage in isolation at
the bench config (render_scale=2, 4096 pts, window 128/stride 2)."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
import pose_refine_tpu as prt
from pose_refine_tpu import geometry, icp, mesh
from pose_refine_tpu.ops.rasterize_pallas import rasterize_pallas
from pose_refine_tpu.ops.depth_to_cloud import window_cloud
from pose_refine_tpu.utils.sync import sync
from pose_refine_tpu.utils.timer import time_jitted

W, H, N = 640, 480, 256
RW, RH = 320, 240
model = mesh.load_benchmark_model()
tris = jnp.asarray(model.tris[mesh.morton_order(model.tris)])
K = geometry.LINEMOD_K
K2 = K.copy(); K2[:2] /= 2
proj = geometry.compute_proj(K, W, H)
R1 = np.array([[0.34768538, 0.93761126, 0.0],[0.70540612, -0.26157897, -0.65877056],[-0.61767070, 0.22904489, -0.75234390]], np.float32)
truth = np.asarray(geometry.pose_from_Rt(R1, np.array([0,0,300], np.float32)))
rng = np.random.default_rng(0)
d_rot = np.asarray(geometry.euler_to_rotation(rng.uniform(-0.17,0.17,(N,3)).astype(np.float32)))
poses = jax.device_put(jnp.asarray(np.asarray(geometry.pose_from_Rt(
    jnp.einsum('nij,jk->nik', d_rot, truth[:3,:3]), truth[:3,3] + rng.uniform(-20,20,(N,3)).astype(np.float32)))))

scene_depth = np.asarray(sync(rasterize_pallas(tris, jnp.asarray(truth)[None], W, H, proj)))[0]
refiner = prt.PoseRefiner(model, K=K, width=W, height=H, render_scale=2,
                          max_points=4096, window=128, stride=2, chunk_iters=64)
refiner.set_scene_depth(scene_depth)
scene = refiner.scene
roi = refiner.roi
print("roi (render px):", roi)

# stage 1: render only
t_render = time_jitted(
    jax.jit(lambda p: rasterize_pallas(tris, p, RW, RH, proj, roi=roi)), poses, iters=3)
print(f"render@{RW}x{RH} roi: {t_render*1000:7.1f} ms")

# stage 2: render + lift
@jax.jit
def render_lift(p):
    d = rasterize_pallas(tris, p, RW, RH, proj, roi=roi)
    def one(dd):
        return window_cloud(dd, jnp.asarray(K2), window=128, stride=2, tl_x=roi[0], tl_y=roi[1])
    return jax.vmap(one)(d)
t_rl = time_jitted(render_lift, poses, iters=3)
print(f"render + lift:   {t_rl*1000:7.1f} ms  (lift = {1000*(t_rl-t_render):5.1f})")

# stage 3: ICP only on fixed clouds
clouds, valids, _ = render_lift(poses)
clouds, valids = jax.device_put(clouds), jax.device_put(valids)
@jax.jit
def icp_only(c, v):
    def one(cc, vv):
        return icp.icp_point_to_plane(cc, vv, scene.query,
                                      icp.ICPConvergenceCriteria(), chunk_iters=64)
    return jax.vmap(one)(c, v)
t_icp = time_jitted(icp_only, clouds, valids, iters=3)
print(f"ICP (31 iters):  {t_icp*1000:7.1f} ms  ({t_icp/31*1000:4.1f} ms/iter)")

# full fused
t0 = None
refined, res = refiner.refine(poses); sync((refined,))
ts = []
for _ in range(5):
    t0 = time.perf_counter(); r, s = refiner.refine(poses); sync((r,))
    ts.append(time.perf_counter() - t0)
t_full = sorted(ts)[2]
print(f"full fused:      {t_full*1000:7.1f} ms  (sum of stages {1000*(t_rl+t_icp):5.1f})")

# ICP iteration scaling: how many iterations until batch convergence?
for iters in (10, 15, 20, 31):
    @jax.jit
    def icp_it(c, v, it=iters):
        def one(cc, vv):
            return icp.icp_point_to_plane(cc, vv, scene.query,
                                          icp.ICPConvergenceCriteria(max_iteration=it), chunk_iters=64)
        return jax.vmap(one)(c, v)
    t = time_jitted(icp_it, clouds, valids, iters=3)
    res2, _ = icp_it(clouds, valids)
    T_mm = np.asarray(res2.transformation).copy(); T_mm[:, :3, 3] *= 1000.0
    fin = np.einsum("nij,njk->nik", T_mm, np.asarray(poses))
    from pose_refine_tpu.utils.metrics import rotation_angle_deg
    rec = (rotation_angle_deg(fin, truth) < 3.0).mean()
    print(f"  max_iter {iters:2d}: {t*1000:6.1f} ms, recovered {rec*100:3.0f}%")
