"""parity_vs_reference harness: known-runnable before the real artifact.

VERDICT r3 item 1a: the repo must have a single command that runs the
real-checkpoint parity the moment the DVC artifact
(/root/reference/checkpoints/bestmodel.ckpt.dvc:1-4) appears. These tests
drive scripts/parity_vs_reference.py end-to-end against a locally created
Lightning-format checkpoint of the re-stated torch flagship
(tests/test_convert_flagship.py), so every stage — weights_only load,
geometry sniff, conversion, native-checkpoint save, JaxInference scoring,
PROOFS JSON, tolerance gate — is proven runnable.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from scripts.parity_vs_reference import main, sniff_network  # noqa: E402
from tests.test_convert_flagship import DEC_CH, _torch_flagship  # noqa: E402
from tests.test_data import _write_shard  # noqa: E402


@pytest.fixture(scope="module")
def lightning_ckpt(tmp_path_factory):
    """A Lightning-format checkpoint (state_dict under ``model.`` prefix,
    like SemSegment's save) of the re-stated b0-geometry flagship."""
    torch.manual_seed(3)
    tmodel = _torch_flagship().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)
    sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
    path = tmp_path_factory.mktemp("ref") / "bestmodel.ckpt"
    torch.save({"state_dict": sd, "epoch": 277, "global_step": 1}, str(path))
    return path


def test_sniff_network_flagship(lightning_ckpt):
    from deadtrees_tpu.models.convert import load_torch_state_dict

    sd = load_torch_state_dict(lightning_ckpt)
    s = sniff_network(sd)
    assert s["encoder_name"] == "timm-efficientnet-b0"
    assert s["architecture"] == "efficientunet++"
    assert s["in_channels"] == 4
    assert s["classes"] == 3
    assert s["head_in"] == DEC_CH[-1]


def test_sniff_network_rejects_unknown_layout():
    with pytest.raises(ValueError, match="unknown checkpoint layout"):
        sniff_network({"model.foo.weight": np.zeros((1, 1))})


def test_harness_end_to_end_on_shard(lightning_ckpt, tmp_path):
    shard = tmp_path / "test-000000.tar"
    _write_shard(shard, 6, size=32, seed=11)
    out = tmp_path / "parity.json"
    converted = tmp_path / "converted.ckpt"

    rc = main([
        "--torch-ckpt", str(lightning_ckpt),
        "--shard", str(shard),
        "--decoder-channels", *[str(c) for c in DEC_CH],
        "--batch", "3",
        "--save-converted", str(converted),
        "--out", str(out),
    ])
    assert rc == 0
    assert converted.exists()
    report = json.loads(out.read_text())
    assert report["status"] == "ok"
    assert report["hparams"]["encoder_name"] == "timm-efficientnet-b0"
    assert report["shards"]["n_samples"] == 6
    assert 0.0 <= report["shards"]["dice"] <= 1.0
    cm = np.asarray(report["shards"]["confusion_matrix"])
    assert cm.sum() == 6 * 32 * 32

    # the converted checkpoint must itself be loadable by the engine stack
    from deadtrees_tpu.core.checkpoint import load_checkpoint

    ckpt = load_checkpoint(converted)
    assert ckpt["hparams"]["architecture"] == "efficientunet++"
    assert ckpt["extra"]["converter"] == "parity_vs_reference"

    # tolerance gate: matching expectation passes, a far-off one fails
    rc = main([
        "--torch-ckpt", str(lightning_ckpt),
        "--shard", str(shard),
        "--decoder-channels", *[str(c) for c in DEC_CH],
        "--batch", "3",
        "--save-converted", str(converted),
        "--out", str(out),
        "--expect-dice", str(report["shards"]["dice"]),
    ])
    assert rc == 0
    assert json.loads(out.read_text())["dice_delta"] <= 1e-6

    rc = main([
        "--torch-ckpt", str(lightning_ckpt),
        "--shard", str(shard),
        "--decoder-channels", *[str(c) for c in DEC_CH],
        "--batch", "3",
        "--save-converted", str(converted),
        "--out", str(out),
        "--expect-dice", str(min(1.0, report["shards"]["dice"] + 0.5)),
    ])
    assert rc == 1
    assert json.loads(out.read_text())["status"] == "FAIL"


def test_harness_scene_mode_with_reference_pred(lightning_ckpt, tmp_path):
    """Scene path: Tiler prediction + mask dice + cross-prediction
    agreement. The 'reference prediction' raster is generated with the
    converted model itself, so the agreement plumbing must report 1.0."""
    import jax.numpy as jnp

    from deadtrees_tpu.infer.geotiff import write_geotiff
    from deadtrees_tpu.infer.sliding import predict_scene
    from deadtrees_tpu.models import create_model
    from scripts.parity_vs_reference import convert_reference_checkpoint

    rng = np.random.default_rng(7)
    scene = rng.integers(0, 255, (64, 64, 4), dtype=np.uint8)
    mask = rng.integers(0, 3, (64, 64), dtype=np.uint8)
    geo = {
        "backend": "pil",
        "tags": {33550: (0.2, 0.2, 0.0),
                 33922: (0.0, 0.0, 0.0, 500000.0, 5400000.0, 0.0)},
    }
    scene_p = tmp_path / "scene.tif"
    mask_p = tmp_path / "mask.tif"
    write_geotiff(scene_p, scene, geo)
    write_geotiff(mask_p, mask, geo)

    variables, hparams, key_audit = convert_reference_checkpoint(
        lightning_ckpt, decoder_channels=DEC_CH
    )
    assert key_audit["unrecognized_keys"] == []
    model = create_model(**hparams, dtype=jnp.float32)
    ref_pred = predict_scene(
        model, variables, scene, subtile=32, batch_size=4,
        tile_shape=(64, 64),
    ).astype(np.uint8)
    ref_p = tmp_path / "ref_pred.tif"
    write_geotiff(ref_p, ref_pred, geo)

    out = tmp_path / "parity_scene.json"
    rc = main([
        "--torch-ckpt", str(lightning_ckpt),
        "--scene", str(scene_p),
        "--mask", str(mask_p),
        "--reference-pred", str(ref_p),
        "--decoder-channels", *[str(c) for c in DEC_CH],
        "--subtile", "32",
        "--batch", "4",
        "--save-converted", str(tmp_path / "c.ckpt"),
        "--out", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    scene_rep = report["scene"]
    assert scene_rep["pred_shape"] == [64, 64]
    assert 0.0 <= scene_rep["dice"] <= 1.0
    vs = scene_rep["vs_reference_pred"]
    assert vs["argmax_agreement"] == pytest.approx(1.0)

    # convention sweep: all 4 bn-eps x pad-type combos scored; the
    # reference prediction came from the default convention (bn_eps 1e-3,
    # static padding), so the winner must reproduce it exactly
    out2 = tmp_path / "parity_conventions.json"
    rc = main([
        "--torch-ckpt", str(lightning_ckpt),
        "--scene", str(scene_p),
        "--reference-pred", str(ref_p),
        "--decoder-channels", *[str(c) for c in DEC_CH],
        "--subtile", "32",
        "--batch", "4",
        "--try-conventions",
        "--save-converted", str(tmp_path / "c2.ckpt"),
        "--out", str(out2),
    ])
    assert rc == 0
    rep2 = json.loads(out2.read_text())
    assert len(rep2["conventions"]) == 4
    best = rep2["best_convention"]
    agree = rep2["conventions"][best]["scene"]["vs_reference_pred"]
    assert agree["argmax_agreement"] == pytest.approx(1.0)
    # the winning convention is recorded in the converted ckpt's hparams
    from deadtrees_tpu.core.checkpoint import load_checkpoint

    hp = load_checkpoint(tmp_path / "c2.ckpt")["hparams"]
    assert "encoder_bn_eps" in hp and "encoder_pad_type" in hp


def test_harness_derives_decoder_channels(lightning_ckpt, tmp_path):
    """With --decoder-channels omitted, the widths come from the
    checkpoint's own conv shapes (the real artifact needs no operator
    knowledge of the recipe)."""
    from scripts.parity_vs_reference import convert_reference_checkpoint

    variables, hparams, _ = convert_reference_checkpoint(lightning_ckpt)
    assert tuple(hparams["decoder_channels"]) == DEC_CH


def test_harness_unet_family_end_to_end(tmp_path):
    """The sweep grid's unet/resnet configurations convert and score
    through the same one-command harness."""
    from tests.test_convert_unet import _torch_unet

    torch.manual_seed(9)
    tmodel = _torch_unet().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)
    sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
    ckpt = tmp_path / "unet_sweep.ckpt"
    torch.save({"state_dict": sd}, str(ckpt))

    shard = tmp_path / "test-000000.tar"
    _write_shard(shard, 4, size=32, seed=21)
    out = tmp_path / "parity_unet.json"
    rc = main([
        "--torch-ckpt", str(ckpt),
        "--shard", str(shard),
        "--batch", "4",
        "--save-converted", str(tmp_path / "unet_conv.ckpt"),
        "--out", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["hparams"]["architecture"] == "unet"
    assert report["hparams"]["encoder_name"] == "resnet18"
    assert tuple(report["hparams"]["decoder_channels"]) == (16, 16, 8, 8, 8)
    assert report["key_audit"]["unrecognized_keys"] == []
    assert report["shards"]["n_samples"] == 4


def test_harness_conventions_rejected_for_unet(tmp_path):
    """bn-eps/pad-type are efficientnet-specific; a unet checkpoint gets a
    clear CLI error instead of a deep TypeError from the resnet builder."""
    from tests.test_convert_unet import _torch_unet

    torch.manual_seed(2)
    tmodel = _torch_unet().eval()
    sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
    ckpt = tmp_path / "unet.ckpt"
    torch.save({"state_dict": sd}, str(ckpt))
    shard = tmp_path / "s-000000.tar"
    _write_shard(shard, 2, size=32, seed=1)
    with pytest.raises(SystemExit):
        main([
            "--torch-ckpt", str(ckpt),
            "--shard", str(shard),
            "--try-conventions",
            "--out", str(tmp_path / "o.json"),
        ])


def test_sniff_network_resnet50_vs_34():
    """Both have 16 blocks; the bottleneck's conv3 disambiguates."""
    sd = {"model.encoder.conv1.weight": np.zeros((64, 4, 7, 7))}
    for stage, n in zip((1, 2, 3, 4), (3, 4, 6, 3)):
        for b in range(n):
            for c in ("conv1", "conv2", "conv3"):
                sd[f"model.encoder.layer{stage}.{b}.{c}.weight"] = np.zeros((1,))
    assert sniff_network(sd)["encoder_name"] == "resnet50"
    sd34 = {k: v for k, v in sd.items() if not k.endswith("conv3.weight")}
    assert sniff_network(sd34)["encoder_name"] == "resnet34"


def test_harness_resunet_family_end_to_end(tmp_path):
    from tests.test_convert_unet import _torch_resunet

    torch.manual_seed(13)
    tmodel = _torch_resunet().eval()
    sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
    ckpt = tmp_path / "resunet_sweep.ckpt"
    torch.save({"state_dict": sd}, str(ckpt))

    shard = tmp_path / "test-000000.tar"
    _write_shard(shard, 4, size=32, seed=31)
    out = tmp_path / "parity_resunet.json"
    rc = main([
        "--torch-ckpt", str(ckpt),
        "--shard", str(shard),
        "--batch", "4",
        "--save-converted", str(tmp_path / "resunet_conv.ckpt"),
        "--out", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["hparams"]["architecture"] == "resunet"
    assert tuple(report["hparams"]["decoder_channels"]) == (16, 16, 8, 8, 8)
    assert report["key_audit"]["unrecognized_keys"] == []
    assert report["shards"]["n_samples"] == 4


def test_harness_unetpp_family_end_to_end(tmp_path):
    from tests.test_convert_unet import _torch_unetpp

    torch.manual_seed(17)
    tmodel = _torch_unetpp().eval()
    sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
    ckpt = tmp_path / "unetpp_sweep.ckpt"
    torch.save({"state_dict": sd}, str(ckpt))

    shard = tmp_path / "test-000000.tar"
    _write_shard(shard, 4, size=32, seed=41)
    out = tmp_path / "parity_unetpp.json"
    rc = main([
        "--torch-ckpt", str(ckpt),
        "--shard", str(shard),
        "--batch", "4",
        "--save-converted", str(tmp_path / "unetpp_conv.ckpt"),
        "--out", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["hparams"]["architecture"] == "unet++"
    assert tuple(report["hparams"]["decoder_channels"]) == (16, 16, 8, 8, 8)
    assert report["key_audit"]["unrecognized_keys"] == []


def test_harness_onnx_end_to_end(tmp_path):
    """VERDICT r4 item 1: the harness runs from the reference's SECOND
    artifact (bestmodel.onnx) alone — fused graph (the reference's export
    flags), Lightning ``model.`` prefix on initializer names, conventions
    resolved structurally, scored on a shard, PROOFS JSON written."""
    from deadtrees_tpu.models.onnx_io import onnx_from_torch_modules

    torch.manual_seed(7)
    tmodel = _torch_flagship().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)

    class Wrapped(torch.nn.Module):  # SemSegment wraps the net as .model
        def __init__(self):
            super().__init__()
            self.model = tmodel

        def forward(self, x):
            return self.model(x)

    onnx_path = tmp_path / "bestmodel.onnx"
    onnx_path.write_bytes(
        onnx_from_torch_modules(Wrapped().eval(), fuse_bn=True))

    shard = tmp_path / "test-000000.tar"
    _write_shard(shard, 6, size=32, seed=13)
    out = tmp_path / "parity_onnx.json"
    converted = tmp_path / "converted_from_onnx.ckpt"

    rc = main([
        "--onnx", str(onnx_path),
        "--shard", str(shard),
        "--decoder-channels", *[str(c) for c in DEC_CH],
        "--batch", "3",
        "--save-converted", str(converted),
        "--out", str(out),
    ])
    assert rc == 0
    assert converted.exists()
    report = json.loads(out.read_text())
    assert report["status"] == "ok"
    assert report["onnx"]["fused_graph"]
    assert report["onnx"]["suggest_pad_type"] == "static"
    assert report["hparams"]["encoder_name"] == "timm-efficientnet-b0"
    assert report["hparams"]["encoder_pad_type"] == "static"
    assert report["shards"]["n_samples"] == 6


def test_harness_rejects_both_or_neither_artifact(tmp_path):
    with pytest.raises(SystemExit):
        main(["--shard", "x.tar"])  # neither --torch-ckpt nor --onnx


def test_harness_resunetpp_family_end_to_end(tmp_path):
    """VERDICT r4 item 2 + ADVICE r4 medium: resunet++ closes the sweep
    grid at 5/5 — the sniff must name it (NOT fall through to resunet,
    whose blocks share identity_conv + conv1/conv2), derive halved
    decoder widths, and convert the ASPP/attention weights."""
    from tests.test_convert_resunetpp import _torch_resunetpp

    torch.manual_seed(23)
    tmodel = _torch_resunetpp().eval()
    sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
    ckpt = tmp_path / "resunetpp_sweep.ckpt"
    torch.save({"state_dict": sd}, str(ckpt))

    from deadtrees_tpu.models.convert import load_torch_state_dict

    sniffed = sniff_network(load_torch_state_dict(ckpt))
    assert sniffed["architecture"] == "resunet++"
    assert sniffed["encoder_name"] == "resnet18"

    shard = tmp_path / "test-000000.tar"
    _write_shard(shard, 4, size=32, seed=37)
    out = tmp_path / "parity_resunetpp.json"
    rc = main([
        "--torch-ckpt", str(ckpt),
        "--shard", str(shard),
        "--batch", "4",
        "--save-converted", str(tmp_path / "resunetpp_conv.ckpt"),
        "--out", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["hparams"]["architecture"] == "resunet++"
    assert tuple(report["hparams"]["decoder_channels"]) == (16, 16, 8, 8, 8)
    assert report["key_audit"]["unrecognized_keys"] == []
    assert report["shards"]["n_samples"] == 4


def test_harness_effunetpp_resnet_encoder_cross(tmp_path):
    """ADVICE r4 low: the sweep grid crosses efficientunet++ with
    resnet34 — the converter must route the resnet encoder through
    _convert_encoder_for instead of raising on _effnet_mults."""
    from deadtrees_tpu.models.convert import convert_effunetpp_checkpoint
    from tests.test_convert import _torch_resnet18
    from tests.test_convert_flagship import _torch_effunetpp_decoder

    import torch.nn as nn

    dec_ch = (16, 16, 8, 8, 8)

    class EffUnetPPResnet(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = _torch_resnet18(4)
            channels = (4, 64, 64, 128, 256, 512)
            self.decoder = _torch_effunetpp_decoder(channels, dec_ch)
            self.segmentation_head = nn.Sequential(
                nn.Conv2d(dec_ch[-1], 3, 3, padding=1)
            )

        def forward(self, x):
            feats = self.encoder(x)
            return self.segmentation_head(self.decoder(*feats))

    torch.manual_seed(29)
    tmodel = EffUnetPPResnet().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_effunetpp_checkpoint(sd, encoder_name="resnet18")


    from deadtrees_tpu.models import create_model

    model = create_model(
        "efficientunet++", "resnet18", in_channels=4, classes=3,
        decoder_channels=dec_ch, dtype=np.float32,
    )
    x = np.random.default_rng(9).normal(size=(1, 64, 64, 4)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    j_logits = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        x, train=False,
    )
    err = np.abs(np.asarray(j_logits).transpose(0, 3, 1, 2) - t_logits).max()
    assert err < 2e-3, f"effunet++/resnet logits max err {err}"
