import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from pose_refine_tpu.utils.timer import time_jitted
from pose_refine_tpu import geometry
from pose_refine_tpu.icp import _solve_damped, _normal_equations
from pose_refine_tpu.scene.projective import SceneProjective

rng = np.random.default_rng(0)
B, P = 256, 8192

depth = np.zeros((480, 640), np.int32); depth[100:380, 150:500] = rng.integers(250, 400, (280, 350))
scene = jax.tree.map(jax.device_put, SceneProjective.from_depth(depth, geometry.LINEMOD_K))
clouds = jax.device_put(jnp.asarray((rng.normal(size=(B, P, 3)) * 0.05 + [0, 0, 0.32]).astype(np.float32)))
valids = jax.device_put(jnp.ones((B, P), bool))

# full single iteration (query + reduce)
@jax.jit
def one_iter(c, v):
    return jax.vmap(lambda a, b: _normal_equations(a, b, scene.query))(c, v)
print(f"reduce iter (query+einsum) B256xP8192: {time_jitted(one_iter, clouds, valids, iters=5)*1000:8.2f} ms", flush=True)

AtA = jax.device_put(jnp.tile(jnp.eye(6) * 100, (B, 1, 1)))
Atb = jax.device_put(jnp.ones((B, 6)))

@jax.jit
def solve(a, b):
    return jax.vmap(_solve_damped)(a, b)
print(f"batched 6x6 cho solve x256:            {time_jitted(solve, AtA, Atb, iters=5)*1000:8.2f} ms", flush=True)

x6 = jax.device_put(jnp.full((B, 6), 0.01))
@jax.jit
def twist_and_transform(x, c):
    upd = jax.vmap(geometry.twist_to_mat4)(x)
    return jax.vmap(geometry.transform_points)(upd, c)
print(f"twist+transform x256:                  {time_jitted(twist_and_transform, x6, clouds, iters=5)*1000:8.2f} ms", flush=True)

# lu-free explicit gaussian elimination solve (fully batched elementwise)
def solve_gauss(a, b, penalty=0.01):
    M = a + penalty * jnp.eye(6, dtype=a.dtype)
    aug = jnp.concatenate([M, b[..., :, None]], axis=-1)  # (B, 6, 7)
    for k in range(6):
        piv = aug[..., k, k][..., None]
        row = aug[..., k, :] / piv
        aug = aug.at[..., k, :].set(row)
        factors = aug[..., :, k][..., None]
        mask = jnp.arange(6)[:, None] != k
        aug = aug - jnp.where(mask, factors * row[..., None, :], 0.0)
        aug = aug.at[..., k, :].set(row)
    return aug[..., :, 6]

sg = jax.jit(solve_gauss)
x_ref = np.asarray(solve(AtA, Atb))
x_g = np.asarray(sg(AtA, Atb))
print("gauss max err:", np.abs(x_ref - x_g).max(), flush=True)
print(f"batched gauss solve x256:              {time_jitted(sg, AtA, Atb, iters=5)*1000:8.2f} ms", flush=True)
