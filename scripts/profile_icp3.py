import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from pose_refine_tpu.utils.timer import time_jitted
from pose_refine_tpu import geometry
from pose_refine_tpu.icp import _normal_equations, _solve_damped
from pose_refine_tpu.scene.projective import SceneProjective

rng = np.random.default_rng(0)
B, P, ITERS = 256, 8192, 31
depth = np.zeros((480, 640), np.int32); depth[100:380, 150:500] = rng.integers(250, 400, (280, 350))
scene = jax.tree.map(jax.device_put, SceneProjective.from_depth(depth, geometry.LINEMOD_K))
clouds = jax.device_put(jnp.asarray((rng.normal(size=(B, P, 3)) * 0.05 + [0, 0, 0.32]).astype(np.float32)))
valids = jax.device_put(jnp.ones((B, P), bool))

def solve_gauss(a, b, penalty=0.01):
    M = a + penalty * jnp.eye(6, dtype=a.dtype)
    aug = jnp.concatenate([M, b[..., :, None]], axis=-1)
    for k in range(6):
        piv = aug[..., k, k][..., None]
        row = aug[..., k, :] / piv
        factors = aug[..., :, k][..., None]
        mask = (jnp.arange(6)[:, None] != k)
        aug = aug - jnp.where(mask, factors * row[..., None, :], 0.0)
        aug = aug.at[..., k, :].set(row)
    return aug[..., :, 6]

def make_loop(solver, with_solve=True):
    def one(cloud, valid):
        def body(i, c):
            AtA, Atb, count, mse = _normal_equations(c, valid, scene.query)
            if with_solve:
                x = solver(AtA, Atb)
            else:
                x = Atb[:6] * 1e-6
            upd = geometry.twist_to_mat4(x)
            return geometry.transform_points(upd, c)
        return jax.lax.fori_loop(0, ITERS, body, cloud)
    return jax.jit(lambda c, v: jax.vmap(one)(c, v))

f_cho = make_loop(_solve_damped)
f_gau = make_loop(solve_gauss)
f_nos = make_loop(None, with_solve=False)
print(f"31-iter loop, cho solve:   {time_jitted(f_cho, clouds, valids, iters=3)*1000:8.1f} ms", flush=True)
print(f"31-iter loop, gauss solve: {time_jitted(f_gau, clouds, valids, iters=3)*1000:8.1f} ms", flush=True)
print(f"31-iter loop, no solve:    {time_jitted(f_nos, clouds, valids, iters=3)*1000:8.1f} ms", flush=True)
