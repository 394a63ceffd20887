"""Component-level cost accounting for the batched ICP iteration on TPU.

Times each stage of the per-iteration work at bench scale (256 x 8192 pts,
31 iters) to locate the gap between the measured ~16 ms/iter and the ~3.5 ms
gather roofline (PERF_NOTES backlog #3 / VERDICT round-1 item 2).
"""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from pose_refine_tpu.utils.timer import time_jitted
from pose_refine_tpu import geometry
from pose_refine_tpu.icp import _normal_equations, _solve_damped
from pose_refine_tpu.scene.projective import SceneProjective

F32 = jax.lax.Precision.HIGHEST
rng = np.random.default_rng(0)
B, P, ITERS = 256, 8192, 31
depth = np.zeros((480, 640), np.int32); depth[100:380, 150:500] = rng.integers(250, 400, (280, 350))
scene = jax.tree.map(jax.device_put, SceneProjective.from_depth(depth, geometry.LINEMOD_K))
clouds = jax.device_put(jnp.asarray((rng.normal(size=(B, P, 3)) * 0.05 + [0, 0, 0.32]).astype(np.float32)))
valids = jax.device_put(jnp.ones((B, P), bool))


def loop(fn):
    """31-iter fori over fn(cloud)->cloud-like, batched over B."""
    def one(cloud, valid):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: fn(c, valid), cloud)
    return jax.jit(jax.vmap(one))


# 1. projection math only (pcd2dep + clip/linearize), no gather
def proj_only(c, v):
    xyd = geometry.pcd2dep(c, scene.K)
    x, y = xyd[..., 0], xyd[..., 1]
    lin = jnp.clip(y, 0, scene.height - 1) * scene.width + jnp.clip(x, 0, scene.width - 1)
    return c + (lin[:, None] % 3).astype(jnp.float32) * 1e-9

# 2. projection + gather (full query)
def query_only(c, v):
    dst, nrm, val = scene.query(c)
    return c + dst * 1e-9

# 3. query + arow build + einsums (full normal equations), no solve
def neq_only(c, v):
    AtA, Atb, count, mse = _normal_equations(c, v, scene.query)
    return c + (AtA[0, 0] + Atb[0] + count + mse) * 1e-12

# 4. full body: neq + solve + twist + transform
def full_body(c, v):
    AtA, Atb, count, mse = _normal_equations(c, v, scene.query)
    x = _solve_damped(AtA, Atb)
    upd = geometry.twist_to_mat4(x)
    return geometry.transform_points(upd, c)

# 5. solve+twist+transform only (no query/neq) - fixed system
def solve_transform(c, v):
    AtA = jnp.eye(6, dtype=jnp.float32) + c[0, 0] * 1e-12
    Atb = jnp.ones(6, jnp.float32) * 1e-6
    x = _solve_damped(AtA, Atb)
    upd = geometry.twist_to_mat4(x)
    return geometry.transform_points(upd, c)

for name, fn in (("proj math only", proj_only),
                 ("query (proj+gather+gate)", query_only),
                 ("normal equations (query+arow+einsum)", neq_only),
                 ("solve+twist+transform only", solve_transform),
                 ("full body", full_body)):
    f = loop(fn)
    t = time_jitted(f, clouds, valids, iters=3) * 1000
    print(f"{name:42s} {t:8.1f} ms  ({t/ITERS:5.2f} ms/iter)", flush=True)
