import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
import pose_refine_tpu as prt
from pose_refine_tpu import geometry, mesh
from pose_refine_tpu.ops import rasterize_pallas as rp
from pose_refine_tpu.utils.timer import time_jitted

W, H, N = 640, 480, 256
model = mesh.load_benchmark_model()
tris = jnp.asarray(model.tris[mesh.morton_order(model.tris)])
K = geometry.LINEMOD_K
proj = geometry.compute_proj(K, W, H)
R1 = np.array([[0.34768538, 0.93761126, 0.0],[0.70540612, -0.26157897, -0.65877056],[-0.61767070, 0.22904489, -0.75234390]], np.float32)
truth = np.asarray(geometry.pose_from_Rt(R1, np.array([0,0,300], np.float32)))
rng = np.random.default_rng(0)
d_rot = np.asarray(geometry.euler_to_rotation(rng.uniform(-0.17,0.17,(N,3)).astype(np.float32)))
poses = jax.device_put(jnp.asarray(np.asarray(geometry.pose_from_Rt(jnp.einsum('nij,jk->nik', d_rot, truth[:3,:3]), truth[:3,3] + rng.uniform(-20,20,(N,3)).astype(np.float32)))))

@jax.jit
def setup_only(t, p):
    coef, bb, sb = rp._triangle_setup(t, p, proj, W, H, (0,0,0,0))
    count, ty, tx = rp._tile_counts(bb, H, W, H, (0,0,0,0))
    return coef.sum(), count.sum()

print(f"setup+plan 256:        {time_jitted(setup_only, tris, poses, iters=3)*1000:8.1f} ms", flush=True)

full = jax.jit(lambda t, p: rp.rasterize_pallas(t, p, W, H, proj))
print(f"full raster 256:       {time_jitted(full, tris, poses, iters=3)*1000:8.1f} ms", flush=True)

roi = (115, 56, 512, 320)
roif = jax.jit(lambda t, p: rp.rasterize_pallas(t, p, W, H, proj, roi=roi))
print(f"roi raster 256:        {time_jitted(roif, t:=tris, p:=poses, iters=3)*1000:8.1f} ms", flush=True)

# per-pose cost scaling
for n in (32, 100):
    pp = poses[:n]
    f = jax.jit(lambda t, p: rp.rasterize_pallas(t, p, W, H, proj))
    print(f"full raster {n}:        {time_jitted(f, tris, pp, iters=3)*1000:8.1f} ms", flush=True)

t32 = jax.jit(lambda t, p: rp.rasterize_pallas(t, p, W, H, proj, variant="tile32"))
print(f"tile32 raster 256:     {time_jitted(t32, tris, poses, iters=3)*1000:8.1f} ms", flush=True)
s8 = jax.jit(lambda t, p: rp.rasterize_pallas(t, p, W, H, proj, variant="stripe8"))
print(f"stripe8 raster 256:    {time_jitted(s8, tris, poses, iters=3)*1000:8.1f} ms", flush=True)

t16 = jax.jit(lambda t, p: rp.rasterize_pallas(t, p, W, H, proj, variant="tile16"))
print(f"tile16 raster 256:     {time_jitted(t16, tris, poses, iters=3)*1000:8.1f} ms", flush=True)
