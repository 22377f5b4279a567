"""Hot-path jit nesting: serving wrappers jit OVER the predict steps.

JAX rejects ``compiler_options`` on a NESTED jit at trace time, and the
serving drivers (bench.py's timed program, profile_step.py's scalar
runner) wrap ``make_predict_step``'s jits inside their own options-
carrying top-level jit. This lowers (no backend compile, so the dummy
option name is never validated) and would raise ValueError if the inner
predict steps ever regain per-jit compiler options.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deadtrees_tpu.models import create_model
from deadtrees_tpu.train import make_predict_step


@pytest.mark.parametrize("return_probs", [False, True])
def test_predict_step_nests_under_options_jit(return_probs):
    model = create_model(
        "unet", "resnet18", in_channels=4, classes=3, dtype=jnp.float32
    )
    img = jnp.zeros((1, 64, 64, 4), jnp.float32)
    variables = jax.eval_shape(
        lambda x: model.init(jax.random.PRNGKey(0), x, train=False), img
    )
    rng = np.random.default_rng(0)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.asarray(rng.normal(0, 0.05, s.shape).astype(s.dtype)),
        variables,
    )
    predict = make_predict_step(model, return_probs=return_probs)

    @partial(jax.jit, compiler_options={"xla_fake_option_never_compiled": 1})
    def run(params, batch_stats, x):
        out = predict(params, batch_stats, x)
        head = out[0] if isinstance(out, tuple) else out
        return head.astype(jnp.float32).sum()

    # trace-time check only: .lower() raises ValueError("compiler_options
    # can only be passed to top-level jax.jit") on a nested options jit
    run.lower(variables["params"], variables["batch_stats"], img)
