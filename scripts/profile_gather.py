"""Characterize XLA gather throughput on TPU at the ICP association shape.

Questions: is the gather row-count-bound or byte-bound (row width sweep)?
Does source-table size matter (locality/TLB)? Do sorted indices help?
Informs the ICP gather-roofline attack (VERDICT round-1 item 2).
"""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from pose_refine_tpu.utils.timer import time_jitted

rng = np.random.default_rng(0)
Q = 256 * 8192  # 2M queries, bench scale

REPS = 10  # amortize dispatch overhead inside one program


def bench_gather(table_rows, row_w, sorted_idx=False, dtype=np.float32):
    table = jax.device_put(jnp.asarray(rng.normal(size=(table_rows, row_w)).astype(dtype)))
    idx = rng.integers(0, table_rows, Q).astype(np.int32)
    if sorted_idx:
        idx = np.sort(idx)
    idx = jax.device_put(jnp.asarray(idx))

    @jax.jit
    def f(table, idx):
        acc = jnp.zeros((), table.dtype)
        def body(i, acc):
            rows = jnp.take(table, idx, axis=0)
            return acc + rows[0, 0] + rows[-1, -1]
        return jax.lax.fori_loop(0, REPS, body, acc)

    t = time_jitted(f, table, idx, iters=3) / REPS
    rate = Q / t / 1e6
    gbs = Q * row_w * np.dtype(dtype).itemsize / t / 1e9
    print(f"table {table_rows:>7d} x {row_w:>2d} {np.dtype(dtype).name:8s} sorted={sorted_idx!s:5s}: "
          f"{t*1000:6.2f} ms  {rate:6.0f} M rows/s  {gbs:6.1f} GB/s", flush=True)


print(f"Q = {Q/1e6:.1f}M queries per gather, {REPS} gathers per program")
for w in (1, 2, 4, 8, 16):
    bench_gather(307200, w)
for tr in (32768, 98304, 307200, 1228800):
    bench_gather(tr, 8)
bench_gather(307200, 8, sorted_idx=True)
bench_gather(307200, 4, dtype=np.float32)
pass
