"""Sub-stage costs: rasterizer setup vs kernel, and window_cloud internals,
at the bench config (256 poses, render_scale=2, roi)."""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from pose_refine_tpu import geometry, mesh
from pose_refine_tpu.ops import rasterize as rz
from pose_refine_tpu.ops.rasterize_pallas import _tile_counts, _triangle_setup, rasterize_pallas
from pose_refine_tpu.ops.depth_to_cloud import window_cloud
from pose_refine_tpu.utils.sync import sync
from pose_refine_tpu.utils.timer import time_jitted

W, H, N = 640, 480, 256
RW, RH = 320, 240
ROI = (50, 16, 256, 224)
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

# 1. screen_triangles only
t = time_jitted(jax.jit(lambda p: jax.tree.map(jnp.sum, rz.screen_triangles(tris, p, proj, RW, RH))), poses, iters=3)
print(f"screen_triangles:      {t*1000:7.1f} ms")

# 2. full _triangle_setup
t = time_jitted(jax.jit(lambda p: jax.tree.map(jnp.sum, _triangle_setup(tris, p, proj, RW, RH, ROI))), poses, iters=3)
print(f"_triangle_setup:       {t*1000:7.1f} ms")

# 3. setup + tile counts
@jax.jit
def setup_counts(p):
    coef, bb, sb = _triangle_setup(tris, p, proj, RW, RH, ROI)
    count, ty, tx = _tile_counts(sb, 224, 256, RH, ROI, tile_h=32, tile_w=32)
    return coef.sum(), bb.sum(), sb.sum(), count.sum()
t = time_jitted(setup_counts, poses, iters=3)
print(f"setup + tile_counts:   {t*1000:7.1f} ms")

# 4. full render
t = time_jitted(jax.jit(lambda p: rasterize_pallas(tris, p, RW, RH, proj, roi=ROI)), poses, iters=3)
print(f"full render:           {t*1000:7.1f} ms")

# 5. window_cloud pieces
depth = rasterize_pallas(tris, poses, RW, RH, proj, roi=ROI)
depth = jax.device_put(depth)

@jax.jit
def bbox_only(d):
    def one(dd):
        mask = dd > 0
        rows = jnp.any(mask, axis=1); cols = jnp.any(mask, axis=0)
        ridx = jnp.arange(dd.shape[0]); cidx = jnp.arange(dd.shape[1])
        r0 = jnp.min(jnp.where(rows, ridx, dd.shape[0]))
        r1 = jnp.max(jnp.where(rows, ridx, -1))
        c0 = jnp.min(jnp.where(cols, cidx, dd.shape[1]))
        c1 = jnp.max(jnp.where(cols, cidx, -1))
        return r0 + r1 + c0 + c1
    return jax.vmap(one)(d)
t = time_jitted(bbox_only, depth, iters=3)
print(f"lift: bbox reductions: {t*1000:7.1f} ms")

@jax.jit
def lift_full(d):
    def one(dd):
        return window_cloud(dd, jnp.asarray(K2), window=128, stride=2, tl_x=ROI[0], tl_y=ROI[1])
    return jax.vmap(one)(d)
t = time_jitted(lift_full, depth, iters=3)
print(f"lift: full:            {t*1000:7.1f} ms")
