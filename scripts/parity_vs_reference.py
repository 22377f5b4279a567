#!/usr/bin/env python
"""One-command parity harness against the reference's trained artifacts.

Accepts EITHER reference artifact: the Lightning ``.ckpt``
(``--torch-ckpt``) or the ONNX export (``--onnx``, bestmodel.onnx —
scripts/create_onnx.py:31-45; read first-party by models/onnx_io.py,
which also resolves the two open encoder conventions structurally from
the graph).

The north-star accuracy claim (BASELINE.json: dice within ±0.002 of the
reference checkpoint) is unprovable until the DVC artifact behind
/root/reference/checkpoints/bestmodel.ckpt.dvc:1-4 is present. This script
makes it a single command the moment it appears:

    torch .ckpt → convert (models/convert.py) → native checkpoint →
    JaxInference → dice / argmax agreement on real samples → PROOFS JSON

Input data, one of:

- ``--shard X.tar [Y.tar ...]``: WebDataset-style shards with
  ``rgbn.tif`` + ``mask.tif`` members (the reference's training/test
  shards, deadtreedata.py:277);
- ``--scene S.tif --mask M.tif``: a georeferenced orthophoto + its
  ground-truth mask raster, run through the Tiler
  (reference scripts/inference.py:16-115).

Optional oracles:

- ``--reference-pred P.tif``: the reference's own predicted raster for
  the same scene (e.g. a DVC ``predicted.trees.*`` tile) → pixelwise
  argmax agreement between the frameworks, the strongest parity signal;
- ``--expect-dice D [--tol 0.002]``: the dice the reference model scores
  on the same data → exit non-zero when |dice - D| > tol.

Checkpoint handling: the Lightning artifact is loaded with
``weights_only=True`` (untrusted public blob — no code-executing
unpickling, models/convert.py:load_torch_state_dict). Network geometry is
sniffed from tensor shapes (stem/head kernels, block count) with CLI
overrides; the model of record (efficientunet++/timm-efficientnet-b5,
decoder 256..16, reference configs/model/default.yaml:4-9) is the default.

Known-runnable: tests/test_parity_harness.py drives this end-to-end
against a locally created Lightning-format checkpoint of the re-stated
torch flagship (tests/test_convert_flagship.py), so the harness is proven
before the real artifact lands.
"""

from __future__ import annotations

import argparse
import json
import logging
import re
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

log = logging.getLogger("parity_vs_reference")


# ---------------------------------------------------------------------------
# geometry sniffing
# ---------------------------------------------------------------------------

def sniff_network(sd: dict) -> dict:
    """Infer the network geometry from state-dict tensor shapes.

    Works on the reference's key scheme (``model.`` prefix optional):
    ``encoder.conv_stem.weight`` (timm efficientnet) or ``encoder.conv1.
    weight`` (resnet); ``segmentation_head.0.weight`` for classes and the
    last decoder width. EfficientNet variant is identified by matching the
    total MBConv block count against the B0..B7 repeat table — exact, since
    consecutive variants always differ in depth_mult-rounded repeats.
    """
    from deadtrees_tpu.models.encoders import (
        _EFFNET_BASE,
        _EFFNET_PARAMS,
        _round_repeats,
    )

    keys = set(sd.keys())
    pref = ""
    for p in ("model.", ""):
        if any(k.startswith(p + "encoder.") for k in keys):
            pref = p
            break

    out: dict = {"architecture": None, "encoder_name": None}
    stem_key = f"{pref}encoder.conv_stem.weight"
    if stem_key in keys:
        out["in_channels"] = int(np.asarray(sd[stem_key]).shape[1])
        n_blocks = len(
            {
                k.split(f"{pref}encoder.blocks.")[1].split(".")[0]
                + "."
                + k.split(f"{pref}encoder.blocks.")[1].split(".")[1]
                for k in keys
                if k.startswith(f"{pref}encoder.blocks.")
            }
        )
        for name, (_w, d) in _EFFNET_PARAMS.items():
            expect = sum(_round_repeats(n, d) for (_t, _c, n, _s, _k) in _EFFNET_BASE)
            if expect == n_blocks:
                out["encoder_name"] = f"timm-{name}"
                break
        if out["encoder_name"] is None:
            raise ValueError(
                f"efficientnet block count {n_blocks} matches no B0..B7 variant"
            )
    elif f"{pref}encoder.conv1.weight" in keys:
        out["in_channels"] = int(np.asarray(sd[f"{pref}encoder.conv1.weight"]).shape[1])
        n_blocks = len(
            {
                k.split(f"{pref}encoder.layer")[1].split(".")[0]
                + "."
                + k.split(f"{pref}encoder.layer")[1].split(".")[1]
                for k in keys
                if k.startswith(f"{pref}encoder.layer")
            }
        )
        if f"{pref}encoder.layer1.0.conv3.weight" in keys:
            out["encoder_name"] = "resnet50"  # bottleneck: 3 convs/block
        else:
            out["encoder_name"] = {8: "resnet18", 16: "resnet34"}.get(n_blocks)
        if out["encoder_name"] is None:
            raise ValueError(f"resnet block count {n_blocks} matches neither 18 nor 34")
    else:
        raise ValueError(
            "state dict has neither encoder.conv_stem.weight (efficientnet) "
            "nor encoder.conv1.weight (resnet) — unknown checkpoint layout"
        )

    head_key = f"{pref}segmentation_head.0.weight"
    if head_key in keys:
        hw = np.asarray(sd[head_key]).shape  # (classes, dec_last, 3, 3)
        out["classes"] = int(hw[0])
        out["head_in"] = int(hw[1])
    if any(
        re.match(rf"{re.escape(pref)}decoder\.blocks\.x_\d+_\d+\.conv1\.block\.",
                 k)
        for k in keys
    ):
        out["architecture"] = "efficientunet++"  # inverted-residual cells
    elif any(k.startswith(f"{pref}decoder.blocks.x_") for k in keys):
        out["architecture"] = "unet++"  # Conv2dReLU cells, same dense grid
    elif (
        f"{pref}decoder.center.aspp_block1.0.weight" in keys
        or any(
            re.match(rf"{re.escape(pref)}decoder\.blocks\.\d+\.attention0\.",
                     k)
            for k in keys
        )
    ):
        # MUST precede resunet: resunet++ blocks ALSO carry identity_conv
        # + conv1/conv2 pairs; the ASPP center/attention0 keys are the
        # distinguishing signature (ADVICE r4: the old order silently
        # dropped the attention and ASPP weights)
        out["architecture"] = "resunet++"
    elif any(
        re.match(rf"{re.escape(pref)}decoder\.blocks\.\d+\.identity_conv\.", k)
        for k in keys
    ):
        out["architecture"] = "resunet"  # additive 1x1 skip per block
    elif any(
        re.match(rf"{re.escape(pref)}decoder\.blocks\.\d+\.conv1\.0\.", k)
        for k in keys
    ):
        out["architecture"] = "unet"
    return out


def _effnet_mults(encoder_name: str):
    from deadtrees_tpu.models.encoders import _EFFNET_PARAMS

    key = encoder_name.replace("timm-", "")
    if key not in _EFFNET_PARAMS:
        raise ValueError(f"not an efficientnet encoder: {encoder_name}")
    return _EFFNET_PARAMS[key]


# Key patterns the converter consumes (or knowingly ignores). Anything in
# the state dict matching NONE of these is surfaced as a layout surprise —
# the "silently dropped weights" failure mode for the real artifact.
_CONSUMED_KEY_PATTERNS = [
    r"^encoder\.conv_stem\.weight$",
    r"^encoder\.bn1\.(weight|bias|running_mean|running_var)$",
    r"^encoder\.conv1\.weight$",  # resnet stem
    r"^encoder\.layer\d+\.\d+\.",  # resnet blocks
    r"^encoder\.blocks\.\d+\.\d+\.(conv_pw|conv_dw|conv_pwl)\.weight$",
    r"^encoder\.blocks\.\d+\.\d+\.bn[123]\.(weight|bias|running_mean|running_var)$",
    r"^encoder\.blocks\.\d+\.\d+\.se\.conv_(reduce|expand)\.(weight|bias)$",
    r"^decoder\.blocks\.x_\d+_\d+\.conv[12]\.block\.[013478]\.",
    r"^decoder\.blocks\.x_\d+_\d+\.conv[12]\.[01]\.",  # unet++ Conv2dReLU cells
    r"^decoder\.blocks\.\d+\.conv[12]\.[01]\.",  # smp Unet Conv2dReLU pairs
    r"^decoder\.blocks\.\d+\.identity_conv\.",   # resunet(++) additive skips
    r"^decoder\.(center|final_aspp)\.aspp_block[1-4]\.[02]\.",  # resunet++
    r"^decoder\.(center|final_aspp)\.output\.",
    r"^decoder\.blocks\.\d+\.attention0\."
    r"(encoder_conv|decoder_conv|attn_conv)\.[02]\.",
    r"^decoder\.blocks\.x_\d+_\d+\.conv[12]\.block\.6\.[cs]SE\.",
    r"^decoder\.blocks\.x_\d+_\d+\.conv[12]\.skip_conv\.[01]\.",
    r"^segmentation_head\.0\.(weight|bias)$",
]
_IGNORED_KEY_PATTERNS = [
    r"num_batches_tracked$",           # torch BN step counters
    r"^encoder\.conv_head\.",          # timm classifier head (unused by smp
    r"^encoder\.bn2\.",                # feature extraction past stage 7)
    r"^encoder\.classifier\.",
    r"^encoder\.fc\.",                 # torchvision resnet classifier
    r"^criterion\.", r"^loss", r"^metrics\.",
]


def audit_state_dict_keys(sd: dict) -> dict:
    """Classify keys into consumed / ignored / UNRECOGNIZED patterns."""
    consumed = [re.compile(p) for p in _CONSUMED_KEY_PATTERNS]
    ignored = [re.compile(p) for p in _IGNORED_KEY_PATTERNS]
    unknown = []
    n_consumed = n_ignored = 0
    for k in sd:
        if any(p.search(k) for p in ignored):
            n_ignored += 1
        elif any(p.search(k) for p in consumed):
            n_consumed += 1
        else:
            unknown.append(k)
    if unknown:
        log.warning(
            "%d state-dict keys match no converter pattern (first 10): %s",
            len(unknown), unknown[:10],
        )
    return {
        "n_consumed": n_consumed,
        "n_ignored": n_ignored,
        "unrecognized_keys": sorted(unknown)[:50],
    }


def derive_decoder_channels(sd: dict, architecture: str):
    """Decoder widths read from the state dict itself: each stage's first
    conv's output channels. Works for both families (unet Conv2dReLU
    stacks; effunet dense-grid column x_0_l project convs)."""
    try:
        if architecture in ("unet", "resunet", "resunet++", "resunetplusplus"):
            idxs = sorted({
                int(k.split(".")[2]) for k in sd
                if re.match(r"decoder\.blocks\.\d+\.", k)
            })
            widths = [
                int(np.asarray(sd[f"decoder.blocks.{i}.conv1.0.weight"]).shape[0])
                for i in idxs
            ]
            if architecture in ("resunet++", "resunetplusplus"):
                # internal widths are doubled (decoder.py:203: out_channels
                # = [i * 2 for i in decoder_channels])
                return [w // 2 for w in widths]
            return widths
        cols = sorted({
            int(k.split(".")[2].rsplit("_", 1)[1]) for k in sd
            if k.startswith("decoder.blocks.x_0_")
        })
        out = []
        for l in cols:
            cell = f"decoder.blocks.x_0_{l}.conv1"
            if f"{cell}.block.7.weight" in sd:  # IR project conv (effunet)
                out.append(int(np.asarray(sd[f"{cell}.block.7.weight"]).shape[0]))
            else:  # Conv2dReLU cell (unet++)
                out.append(int(np.asarray(sd[f"{cell}.0.weight"]).shape[0]))
        return out
    except Exception:
        return None


def convert_reference_checkpoint(
    torch_ckpt: Path,
    *,
    architecture: str = None,
    encoder_name: str = None,
    decoder_channels=None,
) -> tuple:
    """Load + convert the Lightning checkpoint → (variables, hparams).

    ``decoder_channels=None`` derives the widths from the state dict."""
    from deadtrees_tpu.models.convert import load_torch_state_dict

    sd = load_torch_state_dict(torch_ckpt)
    return _convert_state_dict(
        sd, architecture=architecture, encoder_name=encoder_name,
        decoder_channels=decoder_channels,
    )


def convert_reference_onnx(
    onnx_path: Path,
    *,
    architecture: str = None,
    encoder_name: str = None,
    decoder_channels=None,
    encoder_bn_eps: float = None,
) -> tuple:
    """Convert the reference's SECOND artifact: ``bestmodel.onnx``.

    The reference exports it with ``opset_version=11,
    do_constant_folding=True`` on the eval-mode model
    (scripts/create_onnx.py:31-45, served by deployment/inference.py:
    128-143 via onnxruntime). Those flags make torch fold every Conv+BN
    pair (eval-peephole), so the graph may arrive fused; either way
    models/onnx_io.py recovers a reference-layout state dict and the
    normal sniff/convert path runs.

    Returns ``(variables, hparams, key_audit, onnx_report)`` where
    ``onnx_report`` carries the structural convention resolution
    (docs/encoder_audit.md rows 14-15): BatchNormalization.epsilon values
    and stride-2 Conv pads straight from the graph — no empirical sweep
    needed. On a fused graph both conventions are embedded in the fused
    weights; de-fusion reproduces them exactly for any model eps.
    """
    from deadtrees_tpu.models.onnx_io import (
        read_onnx,
        scan_conventions,
        state_dict_from_onnx,
    )

    model = read_onnx(Path(onnx_path))
    conventions = scan_conventions(model)
    eps = encoder_bn_eps
    if eps is None:
        enc_eps = sorted({
            v for k, v in conventions["bn_eps"].items()
            if (k[len("model."):] if k.startswith("model.") else k)
            .startswith("encoder.")
        })
        if enc_eps:
            eps = enc_eps[0]  # structurally resolved from the graph
            log.info("encoder BN epsilon read from ONNX graph: %g", eps)
        else:
            eps = 1e-3  # fused graph: eps is baked into the weights;
            #             de-fusion is exact for whatever the model uses
    sd, defuse = state_dict_from_onnx(model, encoder_bn_eps=eps)
    variables, hparams, key_audit = _convert_state_dict(
        sd, architecture=architecture, encoder_name=encoder_name,
        decoder_channels=decoder_channels,
    )
    hparams["encoder_bn_eps"] = eps
    if conventions["suggest_pad_type"]:
        hparams["encoder_pad_type"] = conventions["suggest_pad_type"]
        log.info("stride-2 padding convention read from ONNX graph: %s",
                 conventions["suggest_pad_type"])
    onnx_report = {
        "opset": model.opset,
        "fused_graph": defuse["fused_graph"],
        "n_defused_pairs": len(defuse["defused_pairs"]),
        "bn_eps_values": conventions["bn_eps_values"],
        "suggest_pad_type": conventions["suggest_pad_type"],
        "n_stride2_convs": len(conventions["stride2_pads"]),
        "asymmetric_stride2_pads": sorted(
            w for w, p in conventions["stride2_pads"].items()
            if len(p) == 4 and (p[0] != p[2] or p[1] != p[3])
        )[:10],
        "encoder_bn_eps_used": eps,
    }
    return variables, hparams, key_audit, onnx_report


def _convert_state_dict(
    sd: dict,
    *,
    architecture: str = None,
    encoder_name: str = None,
    decoder_channels=None,
) -> tuple:
    from deadtrees_tpu.models.convert import convert_effunetpp_checkpoint

    sniffed = sniff_network(sd)
    architecture = architecture or sniffed["architecture"] or "efficientunet++"
    encoder_name = encoder_name or sniffed["encoder_name"]

    sd_bare = {
        (k[len("model."):] if k.startswith("model.") else k): v
        for k, v in sd.items()
    }
    if decoder_channels is None:
        decoder_channels = derive_decoder_channels(sd_bare, architecture)
        if decoder_channels is None:
            decoder_channels = (256, 128, 64, 32, 16)  # model-of-record default
            log.warning("could not derive decoder channels; assuming %s",
                        decoder_channels)
        else:
            log.info("derived decoder channels: %s", decoder_channels)
    decoder_channels = tuple(decoder_channels)
    if "head_in" in sniffed and sniffed["head_in"] != decoder_channels[-1]:
        raise ValueError(
            f"segmentation head expects {sniffed['head_in']} input channels "
            f"but decoder_channels end in {decoder_channels[-1]} — pass "
            f"--decoder-channels matching the checkpoint"
        )

    hparams = dict(
        architecture=architecture,
        encoder_name=encoder_name,
        in_channels=sniffed["in_channels"],
        classes=sniffed.get("classes", 3),
        decoder_channels=list(decoder_channels),
    )
    log.info("sniffed network: %s", hparams)

    key_audit = audit_state_dict_keys(sd_bare)

    if architecture in ("efficientunet++", "efficientunetplusplus"):
        # either encoder family (the sweep crosses efficientunet++ with
        # resnet34 as well, sweep.yaml encoder values)
        variables = convert_effunetpp_checkpoint(sd, encoder_name=encoder_name)
    elif architecture == "unet":
        from deadtrees_tpu.models.convert import convert_unet_checkpoint

        variables = convert_unet_checkpoint(sd, encoder_name=encoder_name)
    elif architecture == "resunet":
        from deadtrees_tpu.models.convert import convert_resunet_checkpoint

        variables = convert_resunet_checkpoint(sd, encoder_name=encoder_name)
    elif architecture in ("unet++", "unetplusplus"):
        from deadtrees_tpu.models.convert import convert_unetpp_checkpoint

        variables = convert_unetpp_checkpoint(sd, encoder_name=encoder_name)
    elif architecture in ("resunet++", "resunetplusplus"):
        from deadtrees_tpu.models.convert import convert_resunetpp_checkpoint

        variables = convert_resunetpp_checkpoint(sd, encoder_name=encoder_name)
    else:
        raise NotImplementedError(
            f"parity conversion covers the full sweep grid — "
            f"efficientunet++/unet/unet++/resunet/resunet++ — got "
            f"{architecture}."
        )
    return variables, hparams, key_audit


# ---------------------------------------------------------------------------
# scoring
# ---------------------------------------------------------------------------

def _dice_stats(pred: np.ndarray, target: np.ndarray, classes: int) -> dict:
    """Dice (MONAI-style, with/without background) + per-class agreement
    from integer class maps of identical shape."""
    import jax.numpy as jnp

    from deadtrees_tpu.losses.functional import class2one_hot
    from deadtrees_tpu.losses.metrics import confusion_matrix, dice_score

    if pred.ndim == 2:
        pred = pred[None]
        target = target[None]
    # class2one_hot is channel-last (B, H, W, K), matching the metrics
    p1 = class2one_hot(jnp.asarray(pred.astype(np.int32)), classes)
    t1 = class2one_hot(jnp.asarray(target.astype(np.int32)), classes)
    cm = np.asarray(
        confusion_matrix(jnp.asarray(pred), jnp.asarray(target), num_classes=classes)
    )
    return {
        "dice": float(dice_score(p1, t1)),
        "dice_no_bg": float(dice_score(p1, t1, include_background=False)),
        "pixel_accuracy": float((pred == target).mean()),
        "confusion_matrix": cm.astype(int).tolist(),
    }


def score_on_shards(engine, shards, classes: int, limit: int, batch: int) -> dict:
    from deadtrees_tpu.data.tar import make_sample_stream

    stream = make_sample_stream([str(s) for s in shards], raw=True)
    preds, targets = [], []
    n = 0
    buf = []
    for sample in stream:
        buf.append(sample)
        n += 1
        if len(buf) == batch:
            _flush(engine, buf, preds, targets)
            buf = []
        if limit and n >= limit:
            break
    if buf:
        _flush(engine, buf, preds, targets)
    if not preds:
        raise ValueError(f"no samples found in {list(map(str, shards))}")
    pred = np.stack(preds)
    target = np.stack(targets)
    out = _dice_stats(pred, target, classes)
    out["n_samples"] = int(pred.shape[0])
    return out


def _flush(engine, raw_samples, preds, targets) -> None:
    from deadtrees_tpu.data.tar import materialize_samples

    decoded = materialize_samples(raw_samples)
    imgs = np.stack([s["image"] for s in decoded])
    masks = [np.asarray(s["mask"]) for s in decoded]
    out = np.asarray(engine.run(imgs))
    for i in range(out.shape[0]):
        preds.append(out[i])
        targets.append(masks[i].squeeze())


def score_on_scene(model, variables, scene_path, mask_path, classes: int,
                   subtile: int, batch: int) -> dict:
    from deadtrees_tpu.infer.geotiff import read_geotiff
    from deadtrees_tpu.infer.sliding import predict_scene

    scene = np.asarray(read_geotiff(scene_path).data)
    if scene.ndim == 2:
        scene = scene[..., None]
    # smallest subtile-aligned tile covering the scene (caps padding waste)
    tile = tuple(
        max(subtile, -(-d // subtile) * subtile) for d in scene.shape[:2]
    )
    pred = predict_scene(
        model, variables, scene, subtile=subtile, batch_size=batch,
        tile_shape=tile,
    )
    out = {"scene": str(scene_path), "pred_shape": list(pred.shape)}
    if mask_path:
        mask = np.squeeze(np.asarray(read_geotiff(mask_path).data))
        out.update(_dice_stats(pred, mask.astype(pred.dtype), classes))
    out["_pred"] = pred
    return out


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def _score_conventions(variables, hp, converted, args) -> dict:
    """Score one forward-convention combination on the requested data."""
    import jax.numpy as jnp

    from deadtrees_tpu.infer.engine import JaxInference
    from deadtrees_tpu.models import create_model

    classes = hp["classes"]
    sub: dict = {}
    if args.shard:
        engine = JaxInference(converted)
        sub["shards"] = score_on_shards(
            engine, args.shard, classes, args.limit, args.batch
        )
        log.info("shard dice=%.4f (no-bg %.4f) over %d samples",
                 sub["shards"]["dice"], sub["shards"]["dice_no_bg"],
                 sub["shards"]["n_samples"])

    if args.scene:
        model = create_model(**hp, dtype=jnp.float32)
        scene_report = score_on_scene(
            model, variables, args.scene, args.mask, classes,
            args.subtile, args.batch,
        )
        pred = scene_report.pop("_pred")
        if args.reference_pred:
            from deadtrees_tpu.infer.geotiff import read_geotiff

            ref = np.squeeze(np.asarray(read_geotiff(args.reference_pred).data))
            if ref.shape != pred.shape:
                raise ValueError(
                    f"reference prediction {ref.shape} != ours {pred.shape}"
                )
            agree = _dice_stats(pred, ref.astype(pred.dtype), classes)
            scene_report["vs_reference_pred"] = {
                "argmax_agreement": agree["pixel_accuracy"],
                "dice_between_frameworks": agree["dice"],
            }
            log.info("argmax agreement vs reference prediction: %.6f",
                     agree["pixel_accuracy"])
        sub["scene"] = scene_report
    return sub


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--torch-ckpt", type=Path, default=None,
                    help="reference Lightning checkpoint (bestmodel.ckpt)")
    ap.add_argument("--onnx", type=Path, default=None,
                    help="reference ONNX export (bestmodel.onnx, the "
                         "second DVC artifact) — either artifact suffices "
                         "for parity; the ONNX graph additionally resolves "
                         "the encoder conventions structurally")
    ap.add_argument("--shard", type=Path, nargs="*", default=[],
                    help="tar shard(s) with rgbn.tif + mask.tif samples")
    ap.add_argument("--scene", type=Path, default=None,
                    help="orthophoto GeoTIFF to run through the Tiler")
    ap.add_argument("--mask", type=Path, default=None,
                    help="ground-truth mask raster for --scene")
    ap.add_argument("--reference-pred", type=Path, default=None,
                    help="the reference's predicted raster for --scene "
                         "(argmax agreement between the frameworks)")
    ap.add_argument("--architecture", default=None)
    ap.add_argument("--encoder", dest="encoder_name", default=None)
    ap.add_argument("--decoder-channels", type=int, nargs="+", default=None,
                    help="decoder widths (default: derived from the "
                         "checkpoint's own conv shapes)")
    ap.add_argument("--subtile", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--limit", type=int, default=0,
                    help="cap shard samples scored (0 = all)")
    ap.add_argument("--save-converted", type=Path, default=None,
                    help="also write the converted native checkpoint here")
    ap.add_argument("--bn-eps", type=float, default=None,
                    help="EfficientNet BN epsilon override (1e-3 or 1e-5; "
                         "see docs/encoder_audit.md)")
    ap.add_argument("--pad-type", choices=("static", "same"), default=None,
                    help="EfficientNet stride-2 padding convention override")
    ap.add_argument("--try-conventions", action="store_true",
                    help="score all 4 bn-eps x pad-type conventions and "
                         "report which best matches the checkpoint — run "
                         "this once on the real artifact to resolve the "
                         "timm construction ambiguity empirically")
    ap.add_argument("--expect-dice", type=float, default=None,
                    help="reference model's dice on the same data")
    ap.add_argument("--tol", type=float, default=0.002,
                    help="north-star tolerance for --expect-dice")
    ap.add_argument("--out", type=Path,
                    default=REPO / "PROOFS" / "parity_vs_reference.json")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    if not args.shard and not args.scene:
        ap.error("need --shard and/or --scene")
    if bool(args.torch_ckpt) == bool(args.onnx):
        ap.error("need exactly one of --torch-ckpt / --onnx")

    t0 = time.time()
    onnx_report = None
    if args.onnx:
        variables, hparams, key_audit, onnx_report = convert_reference_onnx(
            args.onnx,
            architecture=args.architecture,
            encoder_name=args.encoder_name,
            decoder_channels=args.decoder_channels,
            encoder_bn_eps=args.bn_eps,
        )
        # the graph already settled the conventions: fold them into the
        # single-combo path unless the user explicitly overrides
        if args.bn_eps is None and "encoder_bn_eps" in hparams:
            args.bn_eps = hparams["encoder_bn_eps"]
        if args.pad_type is None and hparams.get("encoder_pad_type"):
            args.pad_type = hparams["encoder_pad_type"]
        if args.try_conventions and onnx_report["fused_graph"]:
            log.info(
                "--try-conventions on a FUSED onnx graph: BN eps is baked "
                "into the fused weights (de-fusion is exact for any model "
                "eps), so only the padding convention can differ"
            )
        source = args.onnx
    else:
        variables, hparams, key_audit = convert_reference_checkpoint(
            args.torch_ckpt,
            architecture=args.architecture,
            encoder_name=args.encoder_name,
            decoder_channels=args.decoder_channels,
        )
        source = args.torch_ckpt

    from deadtrees_tpu.core import save_checkpoint

    converted = args.save_converted
    if converted is None:
        converted = args.out.parent / (source.stem + "_converted.ckpt")
    converted.parent.mkdir(parents=True, exist_ok=True)

    if args.try_conventions or args.bn_eps or args.pad_type:
        # the convention ambiguity is specific to the re-stated timm
        # efficientnet (docs/encoder_audit.md); resnet forward semantics
        # are fully determined by torchvision
        if hparams["architecture"] not in ("efficientunet++",
                                           "efficientunetplusplus"):
            ap.error(
                "--try-conventions/--bn-eps/--pad-type apply to the "
                "efficientnet encoder family only; this checkpoint is "
                f"{hparams['architecture']}/{hparams['encoder_name']}"
            )
    if args.try_conventions:
        combos = [(e, p) for e in (1e-3, 1e-5) for p in ("static", "same")]
    else:
        combos = [(args.bn_eps, args.pad_type)]

    report = {
        "source_artifact": str(source),
        "torch_ckpt": str(args.torch_ckpt) if args.torch_ckpt else None,
        "onnx": onnx_report,
        "converted_ckpt": str(converted),
        "hparams": hparams,
        "key_audit": key_audit,
        "tolerance": args.tol,
    }
    convention_reports = {}
    onnx_vars_cache = {}
    for bn_eps, pad_type in combos:
        hp = dict(hparams)
        if bn_eps is not None:
            hp["encoder_bn_eps"] = bn_eps
        if pad_type is not None:
            hp["encoder_pad_type"] = pad_type
        cvars = variables
        if (args.onnx and bn_eps is not None
                and bn_eps != hparams.get("encoder_bn_eps")):
            # fused-graph de-fusion synthesizes var = 1 - eps_model, so a
            # different candidate eps needs its own conversion pass
            if bn_eps not in onnx_vars_cache:
                onnx_vars_cache[bn_eps] = convert_reference_onnx(
                    args.onnx,
                    architecture=args.architecture,
                    encoder_name=args.encoder_name,
                    decoder_channels=args.decoder_channels,
                    encoder_bn_eps=bn_eps,
                )[0]
            cvars = onnx_vars_cache[bn_eps]
        save_checkpoint(
            converted,
            params=cvars["params"],
            batch_stats=cvars["batch_stats"],
            hparams=hp,
            extra={"source": str(source),
                   "converter": "parity_vs_reference"},
        )
        sub = _score_conventions(cvars, hp, converted, args)
        convention_reports[f"bn_eps={bn_eps} pad={pad_type}"] = sub

    if args.try_conventions:
        # rank by agreement with the reference prediction when present,
        # else by dice against ground truth
        def _rank(sub):
            scene = sub.get("scene", {})
            vs = scene.get("vs_reference_pred", {})
            return (
                vs.get("argmax_agreement", -1.0),
                sub.get("shards", {}).get("dice", scene.get("dice", -1.0)),
            )

        best = max(convention_reports, key=lambda k: _rank(convention_reports[k]))
        report["conventions"] = convention_reports
        report["best_convention"] = best
        report.update(convention_reports[best])
        log.info("best-matching convention: %s", best)
        # leave the converted ckpt on disk in the winning convention
        hp = dict(hparams)
        eps_s, pad_s = best.replace("bn_eps=", "").split(" pad=")
        if eps_s != "None":
            hp["encoder_bn_eps"] = float(eps_s)
        if pad_s != "None":
            hp["encoder_pad_type"] = pad_s
        wvars = onnx_vars_cache.get(hp.get("encoder_bn_eps"), variables)
        save_checkpoint(
            converted, params=wvars["params"],
            batch_stats=wvars["batch_stats"], hparams=hp,
            extra={"source": str(source),
                   "converter": "parity_vs_reference"},
        )
        report["hparams"] = hp
    else:
        only = next(iter(convention_reports.values()))
        report.update(only)
        report["hparams"] = hparams if combos == [(None, None)] else {
            **hparams,
            **({"encoder_bn_eps": combos[0][0]} if combos[0][0] is not None else {}),
            **({"encoder_pad_type": combos[0][1]} if combos[0][1] is not None else {}),
        }

    status = "ok"
    primary = None
    if args.shard:
        primary = report["shards"]["dice"]
    elif args.mask:
        primary = report["scene"].get("dice")
    if args.expect_dice is not None and primary is not None:
        delta = abs(primary - args.expect_dice)
        report["expect_dice"] = args.expect_dice
        report["dice_delta"] = delta
        status = "ok" if delta <= args.tol else "FAIL"
        log.info("dice delta vs reference: %.4f (tol %.4f) -> %s",
                 delta, args.tol, status)
    report["status"] = status
    report["elapsed_s"] = round(time.time() - t0, 1)

    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(report, indent=2))
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("confusion_matrix",)}, indent=2))
    return 0 if status == "ok" else 1


if __name__ == "__main__":
    raise SystemExit(main())
