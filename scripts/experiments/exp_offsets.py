import time
import numpy as np
from quill_tpu.utils.jaxcfg import configure_jax
configure_jax()
import jax, jax.numpy as jnp
from quill_tpu.ec import msm8
from quill_tpu.fields import pallas8 as p8

def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    for l in leaves: jax.block_until_ready(l)
    np.asarray(jax.device_get(leaves[0].ravel()[0]))

def timed(name, fn, *args, reps=3):
    sync(fn(*args)); best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms (net ~{best*1e3-52:.0f})")

tot = p8.identity_stacked(msm8.LT)            # (99, 5120)
tot_f = jnp.zeros((1, msm8.LT), jnp.float32)

def offsets(sub):
    def f(t, tf):
        bxs = msm8._win_relayout(t, msm8.NB)
        bfs = msm8._win_relayout(tf, msm8.NB)
        bys = p8.seg_scan(bxs, bfs, sub=sub)
        return msm8._win_unlayout(msm8._shift_ident(bys), msm8.NB)
    return jax.jit(f)

timed("offsets sub=1", offsets(1), tot, tot_f)
timed("offsets sub=8 (padded)", offsets(8), tot, tot_f)

# cummax alone
gf = jnp.zeros((256, 1, msm8.LT), jnp.float32)
timed("cummax (256,1,5120)", jax.jit(lambda a: jax.lax.cummax(a, axis=0)), gf)
