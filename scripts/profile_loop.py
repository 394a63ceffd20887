import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from pose_refine_tpu.utils.timer import time_jitted

F32 = jax.lax.Precision.HIGHEST
rng = np.random.default_rng(0)
HW = 307200
table8 = jax.device_put(jnp.asarray(rng.normal(size=(HW, 8)).astype(np.float32)))
clouds = jax.device_put(jnp.asarray((rng.normal(size=(64, 32768, 3)) * 0.05).astype(np.float32)))

def one_iter(t, clouds, shift):
    def one(cloud):
        lin = (jnp.abs(cloud[:, 0] * 1e5).astype(jnp.int32) + shift) % HW
        rows = jnp.take(t, lin, axis=0)
        dst, nrm = rows[:, :3], rows[:, 3:6]
        v = (rows[:, 6] > 0).astype(jnp.float32)
        diff = dst - cloud
        b = jnp.sum(diff * nrm, -1) * v
        arow = jnp.concatenate([jnp.cross(cloud, nrm), nrm], -1) * v[:, None]
        AtA = jnp.einsum("pi,pj->ij", arow, arow, precision=F32)
        Atb = jnp.einsum("pi,p->i", arow, b, precision=F32)
        return AtA, Atb, jnp.sum(v)
    return jax.vmap(one)(clouds)

@jax.jit
def f1(t, c):
    a, b, cnt = one_iter(t, c, 0)
    return jnp.sum(a)

@jax.jit
def f_fori(t, c):
    def body(i, acc):
        a, b, cnt = one_iter(t, c, i)
        return acc + jnp.sum(a)
    return jax.lax.fori_loop(0, 30, body, jnp.float32(0))

@jax.jit
def f_while(t, c):
    def cond(s): return s[0] < 30
    def body(s):
        a, b, cnt = one_iter(t, c, s[0])
        return (s[0] + 1, s[1] + jnp.sum(a))
    return jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0)))[1]

@jax.jit
def f_unroll(t, c):
    acc = jnp.float32(0)
    for i in range(30):
        a, b, cnt = one_iter(t, c, i)
        acc = acc + jnp.sum(a)
    return acc

print(f"1 iter:        {time_jitted(f1, table8, clouds, iters=5)*1000:8.1f} ms", flush=True)
print(f"30 fori:       {time_jitted(f_fori, table8, clouds, iters=3)*1000:8.1f} ms", flush=True)
print(f"30 while:      {time_jitted(f_while, table8, clouds, iters=3)*1000:8.1f} ms", flush=True)

