"""Collective structure of the compiled multi-chip programs.

PERF.md's pod-scale projection rests on two structural claims that a real
pod would test by measurement but an 8-device CPU mesh can test by
*inspection of the compiled HLO* (the partitioner inserts the same
collectives either way — only the transport differs):

1. Data-parallel TRAINING communicates via all-reduce ONLY — no
   all-gather / all-to-all / collective-permute / reduce-scatter of
   activations. That is what makes DP scaling limited by the gradient
   psum alone (reference analogue: latent DDP, SURVEY.md §2.2).
2. Mesh-sharded SCENE INFERENCE (the sequence-parallel analogue,
   infer/sliding.py) is collective-free in the model compute: its only
   cross-device ops are the uint8 output-stitch all-gathers, whose bytes
   are the class map itself (4 orders of magnitude below activation
   traffic) — per-chip throughput therefore multiplies.

These compile-time facts are the two assumptions the 10k-tiles/s
projection (PERF.md r3 "Pod-scale projection") is built on.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from deadtrees_tpu.infer.sliding import make_scene_predictor
from deadtrees_tpu.models import create_model, init_model
from deadtrees_tpu.parallel import create_mesh, replicate
from deadtrees_tpu.train import (
    OptimizerConfig,
    TrainState,
    build_loss,
    make_optimizer,
    make_train_step,
)

NUM_CLASSES = 3

COLLECTIVE_KINDS = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute"
    r"|reduce-scatter|collective-broadcast|ragged-all-to-all)\b"
)


def _collective_kinds(compiled) -> tuple[set, str]:
    txt = compiled.as_text()
    return set(COLLECTIVE_KINDS.findall(txt)), txt


@pytest.fixture(scope="module")
def _setup():
    model = create_model(
        "unet", "resnet18", in_channels=4, classes=NUM_CLASSES,
        decoder_channels=(16, 16, 8, 8, 8), dtype=jnp.float32,
    )
    variables = init_model(model, jax.random.PRNGKey(0), image_size=32)
    mesh = create_mesh()
    assert mesh.devices.size == 8
    return model, variables, mesh


def test_dp_train_step_communicates_via_all_reduce_only(_setup):
    model, variables, mesh = _setup
    tx = make_optimizer(OptimizerConfig(steps_per_epoch=1))
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    loss = build_loss(["GDICE", "FOCAL", "BOUNDARY"], NUM_CLASSES)
    step = make_train_step(model, loss, num_classes=NUM_CLASSES)

    rng = np.random.default_rng(0)
    data = NamedSharding(mesh, P("data"))
    batch = {
        "image": jax.device_put(
            rng.normal(size=(16, 32, 32, 4)).astype(np.float32), data
        ),
        "mask": jax.device_put(
            rng.integers(0, NUM_CLASSES, (16, 32, 32)).astype(np.int32), data
        ),
        "distmap": jax.device_put(
            rng.normal(size=(16, 32, 32, NUM_CLASSES)).astype(np.float32), data
        ),
    }
    state = jax.device_put(state, NamedSharding(mesh, P()))

    kinds, txt = _collective_kinds(
        step.lower(state, batch, jnp.int32(0)).compile()
    )
    assert kinds == {"all-reduce"}, kinds
    # and they are real sites, not just a string fluke
    n_sites = len(re.findall(r"all-reduce(?:-start)?\(", txt))
    assert n_sites >= 1, "expected at least the gradient psum"


def test_flagship_collective_proof_recorded():
    """The all-reduce-only claim must hold for the MODEL OF RECORD, not
    just the toy unet (VERDICT r3 item 3a). The b5 fwd+bwd CPU compile
    takes ~14 min, so the flagship HLO inspection lives in
    scripts/probe_flagship_collectives.py with its result committed to
    PROOFS/; this test pins the recorded outcome (and the slow test below
    re-derives it when explicitly requested)."""
    import json
    from pathlib import Path

    proof = (
        Path(__file__).resolve().parents[1]
        / "PROOFS" / "flagship_collectives_r4.json"
    )
    assert proof.exists(), "run scripts/probe_flagship_collectives.py"
    report = json.loads(proof.read_text())
    assert report["collective_kinds"] == ["all-reduce"]
    assert report["claim_holds"] is True
    assert "b5" in report["model"]


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").environ.get("DEADTREES_FLAGSHIP_HLO"),
    reason="~14 min CPU compile; set DEADTREES_FLAGSHIP_HLO=1 to re-derive "
           "(recorded result asserted by test_flagship_collective_proof_recorded)",
)
def test_flagship_train_step_all_reduce_only(tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import probe_flagship_collectives as probe_mod

    report = probe_mod.probe(tmp_path / "flagship_collectives.json")
    assert report["collective_kinds"] == ["all-reduce"]
    assert report["all_reduce_sites"] >= 1


def test_sharded_scene_inference_gathers_only_the_output(_setup):
    model, variables, mesh = _setup
    pred = make_scene_predictor(model, subtile=32, batch_size=16, mesh=mesh)
    v_rep = replicate(variables, mesh)
    scene = jnp.zeros((128, 128, 4), jnp.uint8)
    valid = jnp.ones((16,), bool)

    kinds, txt = _collective_kinds(
        pred.lower(v_rep["params"], v_rep["batch_stats"], scene, valid).compile()
    )
    # model compute is collective-free; the only cross-device ops are the
    # output-stitch all-gathers, and those carry uint8 class-map bytes
    assert kinds == {"all-gather"}, kinds
    # dtype of every all-gather site, covering the sync and async
    # (all-gather-start, possibly tuple-shaped) spellings
    sites = re.findall(
        r"= \(?([a-z]+[0-9]*)\[[^\]]*\][^\n]*?all-gather(?:-start)?\(", txt
    )
    assert sites, "expected at least one output-stitch all-gather"
    for dtype in sites:
        assert dtype in ("u8", "s8", "pred"), (
            f"all-gather of {dtype} — expected only uint8 output stitching"
        )
