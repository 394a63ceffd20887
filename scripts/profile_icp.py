import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp, time
import pose_refine_tpu as prt
from pose_refine_tpu.scene.projective import SceneProjective
from pose_refine_tpu import geometry

rng = np.random.default_rng(0)
H, W, P = 480, 640, 32768
depth = np.zeros((H,W), np.int32); depth[100:380, 150:500] = rng.integers(250, 400, (280,350))
scene = SceneProjective.from_depth(depth, prt.LINEMOD_K)
pts = rng.uniform(-0.1,0.1,(P,3)).astype(np.float32); pts[:,2] += 0.32
pts = jnp.asarray(pts)

def timeit(f, *a, n=20):
    r = jax.block_until_ready(f(*a))
    t0=time.perf_counter()
    for _ in range(n): r = jax.block_until_ready(f(*a))
    return (time.perf_counter()-t0)/n*1000

q = jax.jit(lambda p: scene.query(p))
print(f"query (2D adv-index gather): {timeit(q, pts):.3f} ms", flush=True)

flat_pcd = jnp.asarray(scene.pcd.reshape(-1,3))
flat_nrm = jnp.asarray(scene.normal.reshape(-1,3))
@jax.jit
def q_flat(p):
    xyd = geometry.pcd2dep(p, scene.K)
    x, y = xyd[...,0], xyd[...,1]
    inb = (x>=0)&(x<W)&(y>=0)&(y<H)
    lin = jnp.clip(y,0,H-1)*W + jnp.clip(x,0,W-1)
    dst = jnp.take(flat_pcd, lin, axis=0)
    nrm = jnp.take(flat_nrm, lin, axis=0)
    valid = inb & (dst[...,2]>0) & (jnp.abs(p[...,2]-dst[...,2])<=scene.max_dist_diff)
    return dst, nrm, valid
print(f"query (flat 1D take):        {timeit(q_flat, pts):.3f} ms", flush=True)

table = jnp.concatenate([flat_pcd, flat_nrm, jnp.zeros((H*W,2), jnp.float32)], axis=1)
@jax.jit
def q_packed(p):
    xyd = geometry.pcd2dep(p, scene.K)
    x, y = xyd[...,0], xyd[...,1]
    inb = (x>=0)&(x<W)&(y>=0)&(y<H)
    lin = jnp.clip(y,0,H-1)*W + jnp.clip(x,0,W-1)
    row = jnp.take(table, lin, axis=0)
    dst, nrm = row[:, :3], row[:, 3:6]
    valid = inb & (dst[...,2]>0) & (jnp.abs(p[...,2]-dst[...,2])<=scene.max_dist_diff)
    return dst, nrm, valid
print(f"query (packed 8f take):      {timeit(q_packed, pts):.3f} ms", flush=True)

from pose_refine_tpu.icp import _normal_equations, _solve_damped
ne = jax.jit(lambda p: _normal_equations(p, jnp.ones(P, bool), scene.query))
print(f"normal_equations full:       {timeit(ne, pts):.3f} ms", flush=True)

AtA = jnp.eye(6)*100; Atb = jnp.ones(6)
sd = jax.jit(_solve_damped)
print(f"solve 6x6:                   {timeit(sd, AtA, Atb):.3f} ms", flush=True)
tw = jax.jit(geometry.twist_to_mat4)
print(f"twist_to_mat4:               {timeit(tw, jnp.ones(6)):.3f} ms", flush=True)
print("DONE_PROFILE", flush=True)
