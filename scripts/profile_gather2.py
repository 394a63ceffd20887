"""Gather rate vs dtype/width: can one row carry the needed 24-32 bytes at
the ~450M rows/s narrow-row rate (f32 width 1-2) instead of the ~200M rows/s
wide-row rate (f32 width 4+)? Bitcasting the packed scene table to wider
element types shrinks the gathered width at constant bytes."""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from pose_refine_tpu.utils.timer import time_jitted

rng = np.random.default_rng(0)
Q = 256 * 8192
R = 307200
REPS = 10


def bench(row_w, dtype, label):
    itemsize = jnp.dtype(dtype).itemsize
    raw = rng.normal(size=(R, row_w * itemsize // 4)).astype(np.float32)
    table = jax.device_put(jax.lax.bitcast_convert_type(
        jnp.asarray(raw).reshape(R, row_w, itemsize // 4), dtype)
        if itemsize > 4 else jnp.asarray(raw))
    idx = jax.device_put(jnp.asarray(rng.integers(0, R, Q).astype(np.int32)))

    @jax.jit
    def f(table, idx):
        def body(i, acc):
            rows = jnp.take(table, idx, axis=0)
            r0 = jax.lax.bitcast_convert_type(rows[:1], jnp.float32)
            return acc + r0.sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    t = time_jitted(f, table, idx, iters=3) / REPS
    print(f"{label:28s}: {t*1000:6.2f} ms  {Q/t/1e6:6.0f} M rows/s  "
          f"{Q*row_w*itemsize/t/1e9:6.1f} GB/s", flush=True)


bench(8, jnp.float32, "f32 x8 (32B, current)")
bench(6, jnp.float32, "f32 x6 (24B)")
bench(1, jnp.int64,   "i64 x1 (8B)")
bench(2, jnp.int64,   "i64 x2 (16B)")
bench(3, jnp.int64,   "i64 x3 (24B)")
bench(4, jnp.int64,   "i64 x4 (32B)")
bench(2, jnp.complex64, "c64 x2 (16B)")
bench(3, jnp.complex64, "c64 x3 (24B)")
bench(4, jnp.complex64, "c64 x4 (32B)")
