"""Scan kernel variants: sublane width x unroll."""
import time
import numpy as np
from quill_tpu.utils.jaxcfg import configure_jax
configure_jax()
import jax, jax.numpy as jnp
from quill_tpu.fields import device8 as f8
from quill_tpu.fields import pallas8 as p8

def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    for l in leaves: jax.block_until_ready(l)
    np.asarray(jax.device_get(leaves[0].ravel()[0]))
    return x

def timed(name, fn, *args, reps=3):
    sync(fn(*args)); best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms (incl ~52ms sync)")

S, M = 256, 5120
one = jnp.asarray(f8.FQ8.one_mont, jnp.float32)
gx = jnp.broadcast_to(one[None, :, None] * 0 + 3, (S, f8.L, M)).astype(jnp.float32)
gy = jnp.broadcast_to(one[None, :, None], (S, f8.L, M)).astype(jnp.float32)
gz = gy
gf = jnp.zeros((S, 1, M), jnp.float32)

for (bc, sub, unroll) in [(8, 8, False), (4, 16, False), (2, 16, False),
                          (4, 8, True), (2, 16, True)]:
    try:
        f = jax.jit(lambda a,b,c,d,bc=bc,sub=sub,u=unroll: p8.seg_scan(
            (a,b,c), d, bc=bc, sub=sub, unroll=u))
        timed(f"seg_scan bc={bc} sub={sub} unroll={unroll}", f, gx, gy, gz, gf)
    except Exception as e:
        print(f"bc={bc} sub={sub} unroll={unroll}: FAILED {str(e)[:100]}")
