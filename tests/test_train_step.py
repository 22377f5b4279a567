"""End-to-end train-step tests: glue of model/loss/optimizer/state.

The reference's implicit contract: one Lightning training_step
(segmodel.py:210-229) = forward → compound loss → backward → clipped Adam
step, with NaN-guarded updates. Here: overfit a tiny batch and check loss
decreases and dice rises — the minimum end-to-end slice of SURVEY.md §7.2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deadtrees_tpu.models import create_model, init_model
from deadtrees_tpu.train import (
    OptimizerConfig,
    TrainState,
    build_loss,
    cosine_annealing_schedule,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

NUM_CLASSES = 3


@pytest.fixture(scope="module")
def _setup_module():
    model = create_model(
        "unet",
        "resnet18",
        in_channels=4,
        classes=NUM_CLASSES,
        decoder_channels=(32, 16, 8, 8, 8),
        dtype=jnp.float32,
    )
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, steps_per_epoch=10))
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    loss = build_loss(["GDICE", "FOCAL", "BOUNDARY"], NUM_CLASSES)

    rng = np.random.default_rng(0)
    mask = np.zeros((2, 32, 32), np.int32)
    mask[:, 8:20, 8:20] = 1
    mask[:, 22:30, 2:10] = 2
    img = (mask[..., None] * 0.3 + rng.normal(size=(2, 32, 32, 4)) * 0.1).astype(
        np.float32
    )
    from deadtrees_tpu.losses.functional import batch_one_hot2dist, class2one_hot

    distmap = np.asarray(
        batch_one_hot2dist(class2one_hot(jnp.asarray(mask), NUM_CLASSES))
    )
    batch = {
        "image": jnp.asarray(img),
        "mask": jnp.asarray(mask),
        "distmap": jnp.asarray(distmap),
    }
    return model, state, loss, batch


@pytest.fixture
def setup(_setup_module):
    """Fresh state copy per test: the train step DONATES its input state
    (donate_argnums), so a shared state object would be deleted."""
    model, state, loss, batch = _setup_module
    state_copy = jax.tree_util.tree_map(jnp.copy, state)
    return model, state_copy, loss, batch


def test_overfit_tiny_batch(setup):
    model, state, loss, batch = setup
    train_step = make_train_step(model, loss, num_classes=NUM_CLASSES)

    state0 = state
    losses, dices = [], []
    for i in range(30):
        state0, metrics = train_step(state0, batch, jnp.int32(0))
        losses.append(float(metrics["total_loss"]))
        dices.append(float(metrics["dice"]))

    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.7, f"loss did not drop: {losses[:3]}...{losses[-3:]}"
    assert dices[-1] > dices[0], f"dice did not improve: {dices[0]} -> {dices[-1]}"
    assert int(state0.step) == 30


def test_frozen_encoder_step(setup):
    model, state, loss, batch = setup
    train_step = make_train_step(model, loss, num_classes=NUM_CLASSES)

    # snapshot BEFORE the call: the step donates its input state
    snap = lambda t: [np.asarray(x) for x in jax.tree_util.tree_leaves(t)]  # noqa: E731
    enc_old = snap(state.params["encoder"])
    dec_old = snap(state.params["decoder"])
    bs_old = snap(state.batch_stats["encoder"])

    new_state, metrics = train_step(state, batch, jnp.int32(0), frozen=True)
    enc_new = jax.tree_util.tree_leaves(new_state.params["encoder"])
    assert all(np.allclose(a, b) for a, b in zip(enc_old, enc_new))
    dec_new = jax.tree_util.tree_leaves(new_state.params["decoder"])
    assert any(not np.allclose(a, b) for a, b in zip(dec_old, dec_new))
    # frozen encoder BN: batch_stats for encoder unchanged
    bs_new = jax.tree_util.tree_leaves(new_state.batch_stats["encoder"])
    assert all(np.allclose(a, b) for a, b in zip(bs_old, bs_new))


def test_frozen_bn_step(setup):
    """frozen_bn=True: BN runs on running stats (loss matches the eval-mode
    forward), batch_stats pass through unchanged, yet ALL params — including
    BN scale/bias — still train."""
    model, state, loss, batch = setup
    step = make_train_step(model, loss, num_classes=NUM_CLASSES, frozen_bn=True)
    eval_step = make_eval_step(model, loss, num_classes=NUM_CLASSES)

    # eval loss on the same params/batch = the train=False forward's loss
    state_copy = jax.tree_util.tree_map(jnp.copy, state)
    eval_loss = float(eval_step(state_copy, batch, jnp.int32(0))["total_loss"])

    snap = lambda t: [np.asarray(x) for x in jax.tree_util.tree_leaves(t)]  # noqa: E731
    bs_old = snap(state.batch_stats)
    p_old = snap(state.params)

    new_state, metrics = step(state, batch, jnp.int32(0))
    assert np.isclose(float(metrics["total_loss"]), eval_loss, rtol=1e-5)
    # running stats untouched
    bs_new = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert all(np.allclose(a, b) for a, b in zip(bs_old, bs_new))
    # params did move — and specifically some BN affine leaf did
    p_new = jax.tree_util.tree_leaves(new_state.params)
    assert any(not np.allclose(a, b) for a, b in zip(p_old, p_new))
    flat = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    flat_old = jax.tree_util.tree_flatten_with_path(
        jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(new_state.params), p_old
        )
    )[0]
    bn_moved = [
        not np.allclose(np.asarray(v), np.asarray(v_old))
        for (path, v), (_, v_old) in zip(flat, flat_old)
        if any("bn" in str(k).lower() or "norm" in str(k).lower()
               for k in path)
    ]
    assert bn_moved and any(bn_moved)


def test_nan_guard_skips_update(setup):
    model, state, loss, batch = setup
    train_step = make_train_step(model, loss, num_classes=NUM_CLASSES)

    bad = dict(batch)
    bad["image"] = batch["image"].at[0, 0, 0, 0].set(jnp.nan)
    p_old = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    new_state, metrics = train_step(state, bad, jnp.int32(0))
    assert not np.isfinite(float(metrics["total_loss"]))
    p_new = jax.tree_util.tree_leaves(new_state.params)
    assert all(np.allclose(a, b, equal_nan=False) for a, b in zip(p_old, p_new))


def test_eval_step_metrics(setup):
    model, state, loss, batch = setup
    eval_step = make_eval_step(model, loss, num_classes=NUM_CLASSES)

    b = dict(batch)
    b["lu"] = jnp.ones_like(batch["mask"])
    out = eval_step(state, b, jnp.int32(0))
    assert out["cm"].shape == (NUM_CLASSES, NUM_CLASSES)
    assert int(out["cm"].sum()) == batch["mask"].size
    assert np.allclose(np.asarray(out["cm"]), np.asarray(out["cm_masked"]))
    assert 0.0 <= float(out["dice"]) <= 1.0


def test_cosine_schedule_matches_torch_formula():
    cfg = OptimizerConfig(learning_rate=3e-4, cosineannealing_tmax=10, steps_per_epoch=5)
    sched = cosine_annealing_schedule(cfg, cfg.learning_rate)
    # epoch 0 -> lr0; epoch 10 (T_max) -> 0; epoch 5 -> lr0/2
    assert np.isclose(float(sched(0)), 3e-4)
    assert np.isclose(float(sched(10 * 5)), 0.0, atol=1e-12)
    assert np.isclose(float(sched(5 * 5)), 1.5e-4)


def test_data_parallel_step_matches_single_device(setup):
    """The psum-over-ICI analogue: same math on a sharded batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deadtrees_tpu.parallel import create_mesh

    model, state, loss, batch = setup
    train_step = make_train_step(model, loss, num_classes=NUM_CLASSES)

    # replicate tiny batch to 8 samples so it splits over the 8 fake devices
    big = {k: jnp.concatenate([v] * 4, axis=0) for k, v in batch.items()}

    mesh = create_mesh()
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, P("data"))) for k, v in big.items()
    }
    # copy BEFORE the single-device call: the step donates its input state
    state_rep = jax.device_put(
        jax.tree_util.tree_map(jnp.copy, state), NamedSharding(mesh, P())
    )
    _, m_single = train_step(state, big, jnp.int32(0))
    _, m_sharded = train_step(state_rep, sharded, jnp.int32(0))

    # sharded reductions reassociate float adds (per-device partial sums),
    # so ~1e-3 relative drift vs the single-device program is expected
    assert np.allclose(
        float(m_single["total_loss"]), float(m_sharded["total_loss"]), rtol=1e-2
    )
    assert np.allclose(float(m_single["dice"]), float(m_sharded["dice"]), rtol=1e-2)


def test_gwdice_loss_config(setup):
    """GWDICE path: logits + integer targets (segmodel.py:176-178 hack)."""
    model, state, _, batch = setup
    gw_loss = build_loss(["GWDICE", "FOCAL"], NUM_CLASSES)
    step = make_train_step(model, gw_loss, num_classes=NUM_CLASSES)
    new_state, metrics = step(state, batch, jnp.int32(0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert "dice_loss" in metrics and "focal_loss" in metrics
    assert int(new_state.step) == 1


def test_dice_and_gdice_mutually_exclusive():
    with pytest.raises(AssertionError):
        build_loss(["GDICE", "DICE"], NUM_CLASSES)
    with pytest.raises(AssertionError):
        build_loss(["FOCAL"], NUM_CLASSES)  # dice-family term required


def test_remat_step_matches_default():
    """remat=True must compute identical updates (it only changes what is
    saved for the backward)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from deadtrees_tpu.models import create_model, init_model
    from deadtrees_tpu.train import (
        OptimizerConfig,
        TrainState,
        build_loss,
        make_optimizer,
        make_train_step,
    )

    model = create_model("unet", "resnet18", in_channels=4, classes=3,
                         decoder_channels=(8, 8, 8, 8, 8), dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    loss = build_loss(["GDICE", "FOCAL"], 3)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 4)).astype(np.float32)),
        "mask": jnp.asarray(rng.integers(0, 3, (2, 32, 32)).astype(np.int32)),
    }

    outs = []
    for remat in (False, True):
        tx = make_optimizer(OptimizerConfig(steps_per_epoch=1))
        state = TrainState.create(
            params=jax.tree_util.tree_map(jnp.copy, variables["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.copy, variables["batch_stats"]),
            tx=tx,
        )
        step = make_train_step(model, loss, num_classes=3, remat=remat)
        new_state, metrics = step(state, dict(batch), jnp.int32(0))
        outs.append((new_state, metrics))

    (s0, m0), (s1, m1) = outs
    assert abs(float(m0["total_loss"]) - float(m1["total_loss"])) < 1e-6
    leaves0 = jax.tree_util.tree_leaves(s0.params)
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grad_accumulation_defers_and_matches_big_batch(setup):
    """accumulate_grad_batches=2: params unchanged after micro-step 1,
    and two identical micro-batches must produce the SAME parameter update
    as one step on the concatenated (duplicated) batch — big-batch
    equivalence of the accumulation path (Lightning Trainer knob)."""
    model, state, loss, batch = setup

    tx_k2 = make_optimizer(
        OptimizerConfig(
            learning_rate=1e-3, steps_per_epoch=10, accumulate_grad_batches=2
        )
    )
    acc_state = TrainState.create(
        params=jax.tree_util.tree_map(jnp.copy, state.params),
        batch_stats=jax.tree_util.tree_map(jnp.copy, state.batch_stats),
        tx=tx_k2,
    )
    step = make_train_step(model, loss, num_classes=NUM_CLASSES)
    p0 = jax.tree_util.tree_map(np.asarray, acc_state.params)

    acc_state, _ = step(acc_state, batch, jnp.int32(0))
    p1 = jax.tree_util.tree_map(np.asarray, acc_state.params)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, p0, p1
    )  # accumulating: no update yet

    acc_state, _ = step(acc_state, batch, jnp.int32(0))
    p2 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, acc_state.params)
    )
    assert any((a != b).any() for a, b in zip(jax.tree_util.tree_leaves(p0), p2))

    # NOTE: end-to-end "k micro-steps == one big-batch step" is NOT testable
    # through the real model — the f32 forward is not numerically
    # duplication-invariant (BatchNorm fast-variance cancellation compounds
    # through depth: duplicated-batch logits differ ~0.6% from the half
    # batch at random init), and the batch-global GDL is not per-sample
    # linear anyway. The optimizer-level contract IS exact; tested below.


def test_grad_accumulation_optimizer_semantics():
    """make_optimizer(accumulate_grad_batches=2): (a) the applied update
    equals a k=1 update fed the MEAN gradient; (b) the cosine schedule's
    step count ticks once per APPLIED update, not per micro-step."""

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    g1 = {"w": jnp.asarray([0.1, -0.2, 0.3, 0.05]), "b": jnp.asarray([0.4, -0.1])}
    g2 = {"w": jnp.asarray([-0.3, 0.1, 0.1, 0.15]), "b": jnp.asarray([0.0, 0.3])}
    gmean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g1, g2)

    cfg = OptimizerConfig(
        learning_rate=1e-3, steps_per_epoch=1, cosineannealing_tmax=10,
        accumulate_grad_batches=2,
    )
    tx = make_optimizer(cfg)
    st = tx.init(params)
    up1, st = tx.update(g1, st, params)
    assert all(
        np.all(np.asarray(u) == 0) for u in jax.tree_util.tree_leaves(up1)
    )  # mid-accumulation: no update
    up2, st = tx.update(g2, st, params)

    ref_tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, steps_per_epoch=1,
                        cosineannealing_tmax=10)
    )
    ref_st = ref_tx.init(params)
    ref_up, ref_st = ref_tx.update(gmean, ref_st, params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9
        ),
        up2, ref_up,
    )

    # schedule stepping: after k micro-steps the inner count is 1 (== the
    # reference's count after one update), not 2
    inner = st.inner_opt_state if hasattr(st, "inner_opt_state") else st
    counts = [
        int(np.asarray(leaf))
        for leaf in jax.tree_util.tree_leaves(inner)
        if getattr(leaf, "dtype", None) == jnp.int32 and np.ndim(leaf) == 0
    ]
    ref_counts = [
        int(np.asarray(leaf))
        for leaf in jax.tree_util.tree_leaves(ref_st)
        if getattr(leaf, "dtype", None) == jnp.int32 and np.ndim(leaf) == 0
    ]
    assert 1 in counts and counts.count(1) >= ref_counts.count(1)
