import sys, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
if jax.devices()[0].platform != "tpu":
    print("NO TPU"); sys.exit(2)
C, R, W = 16, 24, 512
x = jnp.asarray(np.random.default_rng(1).normal(size=(C, R, W)).astype(np.float32))
b4 = jnp.ones((4, C, 1, 1), jnp.float32) * jnp.arange(1, 5)[:, None, None, None]

def run(kern, extra=()):
    try:
        out = pl.pallas_call(kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(extra)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, R, W), jnp.float32),
        )(x, *extra)
        v = float(np.asarray(out[0,0,0])); return f"OK {v:.2f}"
    except Exception as e:
        return "FAIL " + str(e)[:60]

def k_static(x_ref, b_ref, o_ref):
    o_ref[...] = x_ref[...] * b_ref[2]  # static leading index -> (C,1,1)
print("static leading idx:", run(k_static, (b4,)))

def k_dyn(x_ref, b_ref, o_ref):
    i = pl.program_id(0) if False else jnp.int32(2)
    o_ref[...] = x_ref[...] * b_ref[i]
print("dynamic leading idx:", run(k_dyn, (b4,)))
