"""Probe: does Mosaic/Pallas support an in-kernel dynamic gather from a
VMEM-resident table, and at what row rate vs XLA's ~200M rows/s?

Tries jnp.take along axis 0 (sublane gather) of a (R, 8) f32 table.
"""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from pose_refine_tpu.utils.timer import time_jitted

rng = np.random.default_rng(0)
R = 65536          # table rows (fits VMEM: 65536*8*4 = 2 MB)
Q = 256 * 8192     # 2M queries
CHUNK = 8192       # queries per grid step

table = jax.device_put(jnp.asarray(rng.normal(size=(R, 8)).astype(np.float32)))
idx = jax.device_put(jnp.asarray(rng.integers(0, R, Q).astype(np.int32)))


def kernel(idx_ref, table_ref, out_ref):
    idx2d = jnp.broadcast_to(idx_ref[:][:, None], (CHUNK, 8))
    rows = jnp.take_along_axis(table_ref[:], idx2d, axis=0)
    out_ref[:] = rows


@jax.jit
def gather_pallas(table, idx):
    return pl.pallas_call(
        kernel,
        grid=(Q // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, 8), jnp.float32),
    )(idx, table)


try:
    out = gather_pallas(table, idx)
    ref = jnp.take(table, idx, axis=0)
    err = float(jnp.max(jnp.abs(out - ref)))
    print("correct, max err:", err)
    t = time_jitted(gather_pallas, table, idx, iters=5)
    print(f"pallas VMEM gather: {t*1000:.2f} ms -> {Q/t/1e6:.0f} M rows/s")
except Exception as e:
    print("FAILED:", type(e).__name__)
    print(str(e)[:2000])
