import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from pose_refine_tpu.scene.nn import SceneNN
from pose_refine_tpu.utils.timer import time_jitted

rng = np.random.default_rng(0)
# realistic scene: ~26k points
pts = rng.uniform(-0.11, 0.11, (26000, 3)).astype(np.float32)
pts[:, 2] += 0.3
nrm = rng.normal(size=(26000, 3)).astype(np.float32)
nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

kd = SceneNN.from_cloud(pts, nrm, max_dist_diff=0.1, backend="kdtree")
bf = SceneNN.from_cloud(pts, nrm, max_dist_diff=0.1, backend="bruteforce")
kd = jax.tree.map(jax.device_put, kd)
bf = jax.tree.map(jax.device_put, bf)

q = jax.device_put(jnp.asarray((rng.normal(size=(16384, 3)) * 0.05 + [0, 0, 0.3]).astype(np.float32)))

qf_bf = jax.jit(lambda s, p: s.query(p))
print(f"bruteforce query 16384 x 26000: {time_jitted(qf_bf, bf, q, iters=3)*1000:9.1f} ms", flush=True)
print(f"kdtree query 16384 x 26000:     {time_jitted(qf_bf, kd, q, iters=3)*1000:9.1f} ms", flush=True)

fl = jax.tree.map(jax.device_put, SceneNN.from_cloud(pts, nrm, max_dist_diff=0.1, backend="flash"))
print(f"flash-NN query 16384 x 26000:   {time_jitted(qf_bf, fl, q, iters=3)*1000:9.1f} ms", flush=True)
qb = jax.device_put(jnp.asarray((rng.normal(size=(16*16384, 3)) * 0.05 + [0,0,0.3]).astype(np.float32)))
print(f"flash-NN query 262144 x 26000:  {time_jitted(qf_bf, fl, qb, iters=3)*1000:9.1f} ms", flush=True)
