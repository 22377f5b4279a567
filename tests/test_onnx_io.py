"""First-party ONNX ingest (VERDICT r4 item 1).

The reference ships TWO model artifacts — the Lightning ``.ckpt`` and
``bestmodel.onnx`` (scripts/create_onnx.py:31-45, consumed by
deployment/inference.py:128-143; DVC fixture tests/testdata/
bestmodel.onnx.dvc). These tests prove the ingest path end to end the
same way the .ckpt path was proven: the re-stated torch flagship is
serialized to ONNX bytes with the first-party writer (emulating
torch.onnx.export's graph layout — torch itself refuses to export
without the ``onnx`` package) and round-tripped to logits parity, in
BOTH flavors the exporter can produce:

- unfused (BatchNormalization nodes + state-dict-named initializers);
- fused (torch's ``_jit_pass_onnx_eval_peephole`` folds every Conv+BN
  when ``do_constant_folding=True`` on an eval model — exactly the
  reference's export flags, so this is what bestmodel.onnx most likely
  contains), with non-semantic generated bias names.

Plus the structural convention resolution of docs/encoder_audit.md rows
14-15: BatchNormalization.epsilon and stride-2 Conv pads read straight
from the graph.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from deadtrees_tpu.models import create_model  # noqa: E402
from deadtrees_tpu.models.onnx_io import (  # noqa: E402
    OnnxNode,
    onnx_from_torch_modules,
    paired_bn_name,
    read_onnx,
    scan_conventions,
    state_dict_from_onnx,
    write_onnx,
)
from tests.test_convert_flagship import DEC_CH, _torch_flagship  # noqa: E402


def _randomize_bn(tmodel):
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)


def test_writer_reader_round_trip():
    rng = np.random.default_rng(0)
    inits = {
        "encoder.conv_stem.weight": rng.normal(size=(8, 4, 3, 3)).astype(
            np.float32),
        "encoder.bn1.running_var": rng.uniform(0.5, 2, 8).astype(np.float32),
        "shape_const": np.asarray([1, -1, 64], np.int64),
    }
    nodes = [
        OnnxNode(
            op_type="Conv", name="encoder.conv_stem",
            inputs=["input", "encoder.conv_stem.weight"], outputs=["t0"],
            attrs={"pads": [0, 0, 1, 1], "strides": [2, 2], "group": 1,
                   "auto_pad": "NOTSET", "dilations": [1, 1]},
        ),
        OnnxNode(
            op_type="BatchNormalization", name="encoder.bn1",
            inputs=["t0", "encoder.bn1.weight", "encoder.bn1.bias",
                    "encoder.bn1.running_mean", "encoder.bn1.running_var"],
            outputs=["output"],
            attrs={"epsilon": 1e-3, "momentum": 0.9},
        ),
    ]
    data = write_onnx(inits, nodes, opset=11)
    model = read_onnx(data)

    assert model.opset == 11
    assert model.inputs == ["input"] and model.outputs == ["output"]
    assert set(model.initializers) == set(inits)
    for k, v in inits.items():
        assert model.initializers[k].dtype == v.dtype
        np.testing.assert_array_equal(model.initializers[k], v)
    ops = [n.op_type for n in model.nodes]
    assert ops == ["Conv", "BatchNormalization"]
    conv = model.nodes[0]
    assert conv.attrs["pads"] == [0, 0, 1, 1]
    assert conv.attrs["strides"] == [2, 2]
    assert conv.attrs["auto_pad"] == "NOTSET"
    bn = model.nodes[1]
    assert bn.attrs["epsilon"] == pytest.approx(1e-3)
    assert bn.inputs[1] == "encoder.bn1.weight"


def test_scan_conventions_resolves_audit_rows():
    """The two open encoder conventions are read structurally: epsilon
    from BatchNormalization attributes, stride-2 padding symmetry from
    Conv.pads (static [1,1,1,1] vs TF-SAME [0,0,1,1])."""
    w = np.zeros((8, 4, 3, 3), np.float32)
    static = write_onnx(
        {"encoder.conv_stem.weight": w},
        [OnnxNode(op_type="Conv",
                  inputs=["input", "encoder.conv_stem.weight"],
                  outputs=["t0"],
                  attrs={"pads": [1, 1, 1, 1], "strides": [2, 2]}),
         OnnxNode(op_type="BatchNormalization",
                  inputs=["t0", "encoder.bn1.weight", "encoder.bn1.bias",
                          "encoder.bn1.running_mean",
                          "encoder.bn1.running_var"],
                  outputs=["output"], attrs={"epsilon": 1e-3})],
    )
    conv = scan_conventions(read_onnx(static))
    assert conv["bn_eps_values"] == [pytest.approx(1e-3)]
    assert conv["suggest_pad_type"] == "static"
    assert not conv["fused"]

    tf_same = write_onnx(
        {"encoder.conv_stem.weight": w},
        [OnnxNode(op_type="Conv",
                  inputs=["input", "encoder.conv_stem.weight"],
                  outputs=["output"],
                  attrs={"pads": [0, 0, 1, 1], "strides": [2, 2]})],
    )
    assert scan_conventions(read_onnx(tf_same))["suggest_pad_type"] == "same"


def test_paired_bn_name_rules():
    convs = frozenset({
        "encoder.conv_stem",
        "encoder.blocks.0.0.conv_dw", "encoder.blocks.0.0.conv_pw",
        "encoder.blocks.1.0.conv_pw", "encoder.blocks.1.0.conv_dw",
        "encoder.blocks.1.0.conv_pwl",
        "encoder.layer1.0.conv1", "encoder.layer1.0.downsample.0",
        "decoder.blocks.x_0_0.conv1.block.0",
        "decoder.blocks.x_0_0.conv1.block.7",
        "decoder.blocks.x_1_1.conv1.skip_conv.0",
        "decoder.blocks.0.conv1.0",
        "decoder.blocks.0.identity_conv",
    })
    cases = {
        "encoder.conv_stem": "encoder.bn1",
        # DepthwiseSeparable block (no conv_pwl): dw→bn1, pw→bn2
        "encoder.blocks.0.0.conv_dw": "encoder.blocks.0.0.bn1",
        "encoder.blocks.0.0.conv_pw": "encoder.blocks.0.0.bn2",
        # InvertedResidual: pw→bn1, dw→bn2, pwl→bn3
        "encoder.blocks.1.0.conv_pw": "encoder.blocks.1.0.bn1",
        "encoder.blocks.1.0.conv_dw": "encoder.blocks.1.0.bn2",
        "encoder.blocks.1.0.conv_pwl": "encoder.blocks.1.0.bn3",
        "encoder.layer1.0.conv1": "encoder.layer1.0.bn1",
        "encoder.layer1.0.downsample.0": "encoder.layer1.0.downsample.1",
        "decoder.blocks.x_0_0.conv1.block.0":
            "decoder.blocks.x_0_0.conv1.block.1",
        "decoder.blocks.x_0_0.conv1.block.7":
            "decoder.blocks.x_0_0.conv1.block.8",
        "decoder.blocks.x_1_1.conv1.skip_conv.0":
            "decoder.blocks.x_1_1.conv1.skip_conv.1",
        "decoder.blocks.0.conv1.0": "decoder.blocks.0.conv1.1",
        # real-bias convs never pair
        "decoder.blocks.0.identity_conv": None,
        "encoder.blocks.1.0.se.conv_reduce": None,
        "decoder.blocks.x_0_0.conv1.block.6.cSE.1": None,
        "decoder.blocks.x_0_0.conv1.block.6.sSE.0": None,
        "segmentation_head.0": None,
    }
    for conv, expect in cases.items():
        assert paired_bn_name(conv, convs) == expect, conv


def test_unfused_export_recovers_exact_state_dict():
    """Unfused flavor: the recovered state dict IS the torch state dict
    (minus num_batches_tracked) — so all existing converter parity tests
    transfer to the ONNX path unchanged."""
    torch.manual_seed(0)
    tmodel = _torch_flagship().eval()
    _randomize_bn(tmodel)
    data = onnx_from_torch_modules(tmodel, fuse_bn=False)
    sd, report = state_dict_from_onnx(read_onnx(data))

    want = {
        k: v.numpy() for k, v in tmodel.state_dict().items()
        if not k.endswith("num_batches_tracked")
    }
    assert set(sd) == set(want), (
        f"missing={sorted(set(want) - set(sd))[:5]} "
        f"extra={sorted(set(sd) - set(want))[:5]}"
    )
    for k in want:
        np.testing.assert_array_equal(sd[k], want[k], err_msg=k)
    assert not report["fused_graph"]


def _fused_parity(encoder_bn_eps):
    torch.manual_seed(1)
    tmodel = _torch_flagship().eval()
    _randomize_bn(tmodel)
    data = onnx_from_torch_modules(tmodel, fuse_bn=True)
    model_onnx = read_onnx(data)

    # the fused graph must have NO BatchNormalization nodes left and
    # non-semantic bias names (emulating torch's generated names)
    assert not any(n.op_type == "BatchNormalization" for n in model_onnx.nodes)
    conv_nodes = [n for n in model_onnx.nodes if n.op_type == "Conv"]
    fused_biases = [n.inputs[2] for n in conv_nodes
                    if len(n.inputs) > 2 and n.inputs[2].startswith("onnx::")]
    assert fused_biases, "fixture should carry generated bias names"
    assert scan_conventions(model_onnx)["fused"]

    sd, report = state_dict_from_onnx(
        model_onnx, encoder_bn_eps=encoder_bn_eps)
    assert report["fused_graph"]
    # every reference BN site is re-synthesized
    assert any(c == "encoder.conv_stem" for c, _b in report["defused_pairs"])

    from deadtrees_tpu.models.convert import convert_effunetpp_checkpoint

    variables = convert_effunetpp_checkpoint(sd, width_mult=1.0, depth_mult=1.0)
    model = create_model(
        "efficientunet++", "timm-efficientnet-b0",
        in_channels=4, classes=3, decoder_channels=DEC_CH,
        dtype=jnp.float32, encoder_options={"bn_eps": encoder_bn_eps},
    )
    x = np.random.default_rng(2).normal(size=(1, 64, 64, 4)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_logits = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    j_nchw = np.asarray(j_logits).transpose(0, 3, 1, 2)
    return float(np.abs(j_nchw - t_logits).max()), j_nchw, t_logits


def test_fused_export_logits_parity():
    """Fused flavor (the reference's actual export flags): de-fusion via
    identity BNs reproduces the torch model's logits."""
    err, j, t = _fused_parity(encoder_bn_eps=1e-3)
    assert err < 3e-3, f"fused-graph logits max err {err}"
    np.testing.assert_array_equal(j.argmax(1), t.argmax(1))


def test_fused_defusion_exact_for_any_model_eps():
    """The de-fusion's var = 1 - eps synthesis must be exact for whatever
    eps the flax model is built with — proving --try-conventions is moot
    on a fused graph."""
    err, j, t = _fused_parity(encoder_bn_eps=1e-5)
    assert err < 3e-3, f"fused-graph (eps 1e-5) logits max err {err}"


def test_harness_convert_reference_onnx_end_to_end(tmp_path):
    """scripts/parity_vs_reference.convert_reference_onnx: sniff + route +
    convert from ONNX bytes alone, reporting the structural conventions."""
    import sys

    sys.path.insert(0, "scripts")
    from parity_vs_reference import convert_reference_onnx

    torch.manual_seed(3)
    tmodel = _torch_flagship().eval()
    _randomize_bn(tmodel)
    p = tmp_path / "bestmodel.onnx"
    p.write_bytes(onnx_from_torch_modules(tmodel, fuse_bn=True))

    variables, hparams, key_audit, onnx_report = convert_reference_onnx(p)
    assert hparams["architecture"] == "efficientunet++"
    assert hparams["encoder_name"] == "timm-efficientnet-b0"
    assert hparams["in_channels"] == 4 and hparams["classes"] == 3
    assert tuple(hparams["decoder_channels"]) == DEC_CH
    assert onnx_report["fused_graph"]
    assert onnx_report["opset"] == 11
    assert onnx_report["suggest_pad_type"] == "static"
    assert not key_audit["unrecognized_keys"]

    model = create_model(
        "efficientunet++", "timm-efficientnet-b0",
        in_channels=4, classes=3, decoder_channels=DEC_CH,
        dtype=jnp.float32,
        encoder_options={"bn_eps": hparams["encoder_bn_eps"]},
    )
    x = np.random.default_rng(4).normal(size=(1, 64, 64, 4)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_logits = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    err = np.abs(np.asarray(j_logits).transpose(0, 3, 1, 2) - t_logits).max()
    assert err < 3e-3, f"onnx → flax logits max err {err}"


def test_scan_conventions_dynamic_pad_same():
    """timm Conv2dSame exports as Pad-subgraph + Conv(pads=0): that is the
    TF-SAME signature (verified against a real torch export of the
    pattern), while a 1x1 stride-2 zero-pad conv (resnet downsample) in a
    graph that happens to contain Pad ops must stay static."""
    w = np.zeros((8, 4, 3, 3), np.float32)
    dyn_same = write_onnx(
        {"onnx::Conv_47": w},
        [OnnxNode(op_type="Pad", inputs=["input", "p"], outputs=["t0"]),
         OnnxNode(op_type="Conv", name="/encoder/conv_stem/Conv",
                  inputs=["t0", "onnx::Conv_47"], outputs=["output"],
                  attrs={"pads": [0, 0, 0, 0], "strides": [2, 2],
                         "kernel_shape": [3, 3]})],
    )
    assert scan_conventions(read_onnx(dyn_same))["suggest_pad_type"] == "same"

    down = np.zeros((8, 4, 1, 1), np.float32)
    static = write_onnx(
        {"encoder.layer2.0.downsample.0.weight": down,
         "encoder.layer2.0.conv1.weight": w},
        [OnnxNode(op_type="Pad", inputs=["input", "p"], outputs=["t0"]),
         OnnxNode(op_type="Conv", name="/encoder/layer2/downsample/Conv",
                  inputs=["t0", "encoder.layer2.0.downsample.0.weight"],
                  outputs=["t1"],
                  attrs={"pads": [0, 0, 0, 0], "strides": [2, 2],
                         "kernel_shape": [1, 1]}),
         OnnxNode(op_type="Conv", name="/encoder/layer2/conv1/Conv",
                  inputs=["t1", "encoder.layer2.0.conv1.weight"],
                  outputs=["output"],
                  attrs={"pads": [1, 1, 1, 1], "strides": [2, 2],
                         "kernel_shape": [3, 3]})],
    )
    assert scan_conventions(read_onnx(static))["suggest_pad_type"] == "static"
