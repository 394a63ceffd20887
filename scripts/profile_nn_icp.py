import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from pose_refine_tpu.scene.nn import SceneNN
from pose_refine_tpu import icp
from pose_refine_tpu.utils.timer import time_jitted

rng = np.random.default_rng(0)
pts = rng.uniform(-0.11, 0.11, (26000, 3)).astype(np.float32); pts[:, 2] += 0.3
nrm = rng.normal(size=(26000, 3)).astype(np.float32)
nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
scene = jax.tree.map(jax.device_put, SceneNN.from_cloud(pts, nrm, max_dist_diff=0.1, backend="bruteforce"))

for B in (16, 64):
    clouds = jax.device_put(jnp.asarray((rng.normal(size=(B, 16384, 3)) * 0.05 + [0, 0, 0.3]).astype(np.float32)))
    valids = jax.device_put(jnp.ones((B, 16384), bool))
    f = lambda c, v: icp.icp_point_to_plane_batch(c, v, scene)
    print(f"NN-ICP (flash) batch {B} x 16384: {time_jitted(f, clouds, valids, iters=3)*1000:9.1f} ms", flush=True)
