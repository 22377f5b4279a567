import sys, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
if jax.devices()[0].platform != "tpu":
    print("NO TPU"); sys.exit(2)
C, R, W = 16, 24, 512
w = jnp.asarray(np.random.default_rng(0).normal(size=(C, C)).astype(np.float32))
x = jnp.asarray(np.random.default_rng(1).normal(size=(C, R, W)).astype(np.float32))
b3 = jnp.ones((C, 1, 1), jnp.float32)
b2 = jnp.ones((1, C), jnp.float32)

def run(kern, extra=()):
    try:
        out = pl.pallas_call(kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(extra)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, R, W), jnp.float32),
        )(w, x, *extra)
        np.asarray(out.ravel()[:2]); return "OK"
    except Exception as e:
        return "FAIL " + str(e)[:60]

def k_dot(w_ref, x_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(w_ref[...], x_ref[...], (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
print("dot:", run(k_dot))

def k_bias3(w_ref, x_ref, b_ref, o_ref):
    o_ref[...] = x_ref[...] + b_ref[...]
print("bias (C,1,1) broadcast:", run(k_bias3, (b3,)))

def k_bias_none(w_ref, x_ref, b_ref, o_ref):
    o_ref[...] = x_ref[...] + b_ref[0][:, None, None]
print("bias (1,C) row + None-index:", run(k_bias_none, (b2,)))

def k_mask(w_ref, x_ref, o_ref):
    g = jax.lax.broadcasted_iota(jnp.int32, (1, R, 1), 1)
    o_ref[...] = jnp.where((g >= 1) & (g < R-1), x_ref[...], 0.0)
print("iota mask:", run(k_mask))

def k_roll(w_ref, x_ref, o_ref):
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    r = pltpu.roll(x_ref[...], (W-1) % W, axis=2)
    o_ref[...] = jnp.where(col < W-1, r, 0.0)
print("roll+mask:", run(k_roll))

def k_hswish(w_ref, x_ref, o_ref):
    o_ref[...] = jax.nn.hard_swish(x_ref[...])
print("hswish:", run(k_hswish))
