"""Find how many distinct Pallas point-add kernels fit in one compiled
module before the axon compile helper OOMs.  Builds its own up-sweep
pallas calls (identical spec to ec/msm3.py) and compiles K levels as ONE
jit, for growing K."""
import functools
import sys
import time

import numpy as np

from quill_tpu.utils.jaxcfg import configure_jax

configure_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from quill_tpu.ec import msm3  # noqa: E402
from quill_tpu.fields import device8 as f8  # noqa: E402
from quill_tpu.fields import pallas8 as p8  # noqa: E402

L = f8.L
L3 = msm3.L3


def up_run(k_out, m_len):
    pack = p8.consts_pack(f8.FQ8.modulus)
    mt = min(1024, m_len)
    grid = (k_out, m_len // mt)
    in_spec = pl.BlockSpec((2, L3, mt), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, L3, mt), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    def run(x):
        return pl.pallas_call(
            functools.partial(msm3._up_kernel, f8.FQ8.modulus, 1),
            out_shape=jax.ShapeDtypeStruct((k_out, L3, m_len), jnp.float32),
            grid=grid,
            in_specs=[msm3._consts_spec2(), in_spec],
            out_specs=out_spec,
            interpret=p8._interpret(),
        )(pack, x)

    return run


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(jax.lax.slice(leaf, (0,) * leaf.ndim, (1,) * leaf.ndim))


def main():
    m = msm3.M
    ks = [int(a) for a in sys.argv[1:]] or [4, 8]
    for klevels in ks:
        s0 = 1 << klevels

        def sweep(leaves):
            x = leaves
            outs = []
            while x.shape[0] > 1:
                x = up_run(x.shape[0] // 2, m)(x)
                outs.append(x)
            return tuple(outs)

        leaves = jnp.zeros((s0, L3, m), jnp.float32)
        t0 = time.time()
        try:
            fn = jax.jit(sweep)
            out = fn(leaves)
            sync(out[-1])
            print(f"group of {klevels} kernels (m={m}): OK, "
                  f"compile+run {time.time()-t0:.1f}s", flush=True)
        except Exception as e:
            print(f"group of {klevels} kernels: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
