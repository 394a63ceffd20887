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

def make(level):
    def one(cloud, valid):
        def body(i, s):
            c, T, fit, rmse, done = s
            AtA, Atb, count, mse = _normal_equations(c, valid, scene.query)
            x = _solve_damped(AtA, Atb)
            upd = geometry.twist_to_mat4(x)
            if level >= 3:  # fold done into the update instead of selecting clouds
                upd = jnp.where(done, jnp.eye(4, dtype=jnp.float32), upd)
            nc = geometry.transform_points(upd, c)
            if level >= 1:  # fitness/rmse state
                nf = count / jnp.maximum(jnp.sum(valid), 1.0)
                nr = jnp.sqrt(mse / jnp.maximum(count, 1.0))
                conv = (jnp.abs(nf - fit) < 1e-5) & (jnp.abs(nr - rmse) < 1e-5)
                nd = done | conv | (count == 0)
            else:
                nf, nr, nd = fit, rmse, done
            if level == 2:  # classic: full-cloud select on done
                nc = jnp.where(nd, c, nc)
            if level >= 1:
                nT = jnp.where(nd, T, upd @ T)
                nf = jnp.where(done, fit, nf)
                nr = jnp.where(done, rmse, nr)
            else:
                nT = upd @ T
            return (nc, nT, nf, nr, nd)
        init = (cloud, jnp.eye(4, dtype=jnp.float32), jnp.float32(0), jnp.float32(0), jnp.asarray(False))
        return jax.lax.fori_loop(0, ITERS, body, init)
    return jax.jit(lambda c, v: jax.vmap(one)(c, v))

for lvl, name in ((0, "bare: reduce+solve+transform"),
                  (1, "+fitness/done state (no cloud select)"),
                  (2, "+full-cloud done-select (current design)"),
                  (3, "done folded into update matrix")):
    f = make(lvl)
    print(f"{name:45s} {time_jitted(f, clouds, valids, iters=3)*1000:8.1f} ms", flush=True)
