#!/usr/bin/env python
"""Roofline attribution: what share of device time runs at the HBM roofline?

Offline analyzer over the artifacts a `profile_step.py --hlo` run leaves
behind (optimized-HLO text + profiler trace). For every op that appears on
the device timeline it computes:

- HBM bytes moved: sum of operand + output buffer sizes in the DEFAULT
  memory space, read off the op's instruction in the scheduled HLO
  (buffers annotated ``S(1)``/``S(2)`` live in VMEM/SMEM via XLA's memory
  space assignment — cross-program-prefetched weights don't pay HBM);
- FLOPs: convolution/dot instructions (standalone or inside the op's
  fused computation) from output shape x window x input-feature depth;
- its roofline bound: ``max(bytes/BW, flops/PEAK)`` and the achieved
  fraction ``bound_time / measured_time``.

The headline output is the time-weighted share of device time running at
>= X of its per-op roofline bound — the "is there anything left for a
kernel to win?" number for PERF.md (VERDICT r2 item 1's floor-proof form).

Usage:
    python scripts/profile_step.py --mode infer --image-size 512 \
        --batch-size 128 --hlo --outdir /tmp/trace_infer512
    python scripts/roofline_share.py --outdir /tmp/trace_infer512 \
        --hlo infer_hlo.txt

Bandwidth reference points (PERF.md): v5e HW peak ~819 GB/s; the measured
in-program stream rate on this attachment ~540 GB/s (the honest roofline).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict
from dataclasses import dataclass, field

DTYPE_BYTES = {
    "pred": 1, "s4": 0.5, "u4": 0.5, "s8": 1, "u8": 1,
    "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](?:\{([^}]*)\})?")
# instruction: "  %name = <rhs>"  (names may contain dots and dashes)
INSTR_RE = re.compile(r"^\s+(?:ROOT\s+)?%?([\w.-]+) = (.+)$")
COMP_RE = re.compile(r"^(ENTRY\s+)?%?([\w.-]+)\s+\(.*\)\s+->.*\{\s*$")


@dataclass
class Shape:
    dtype: str
    dims: tuple
    memspace: int  # 0 = default (HBM), 1 = VMEM, 2 = SMEM

    @property
    def bytes(self) -> float:
        n = 1
        for d in self.dims:
            n *= d
        return n * DTYPE_BYTES.get(self.dtype, 4)


@dataclass
class Instr:
    name: str
    opcode: str
    shapes: list  # output Shape(s)
    operands: list  # operand instruction names
    attrs: str  # rest of the line (window=..., calls=..., ...)


@dataclass
class OpCost:
    hbm_bytes: float = 0.0
    flops: float = 0.0  # MXU-eligible (dense conv / dot)
    vpu_flops: float = 0.0  # grouped/depthwise conv: VPU-only
    notes: list = field(default_factory=list)


def parse_shapes(text: str):
    """All array shapes in a result-type string (handles tuples)."""
    out = []
    for m in SHAPE_RE.finditer(text):
        dtype, dims, layout = m.group(1), m.group(2), m.group(3) or ""
        if dtype not in DTYPE_BYTES:
            continue
        dims_t = tuple(int(x) for x in dims.split(",") if x) if dims else ()
        sm = re.search(r"S\((\d+)\)", layout)
        out.append(Shape(dtype, dims_t, int(sm.group(1)) if sm else 0))
    return out


def split_instr(rhs: str):
    """Split '<result-type> <opcode>(<operands>)<attrs>' respecting the
    tuple parens a result type may carry."""
    i = 0
    if rhs.startswith("("):  # tuple result type: skip to matching paren
        depth = 0
        for i, ch in enumerate(rhs):
            depth += ch == "("
            depth -= ch == ")"
            if depth == 0:
                break
        i += 1
    # result type runs to the opcode: "<shapes> opcode(..."
    m = re.search(r"\s([\w-]+)\(", rhs[i:])
    if not m:
        return None
    shape_str = rhs[: i + m.start()]
    opcode = m.group(1)
    rest = rhs[i + m.end():]  # starts just after the opening paren
    depth = 1
    for j, ch in enumerate(rest):
        depth += ch == "("
        depth -= ch == ")"
        if depth == 0:
            break
    operand_str, attrs = rest[:j], rest[j + 1:]
    operands = [
        o.strip().lstrip("%")
        for o in operand_str.split(",")
        if o.strip().startswith("%")
    ]
    return shape_str, opcode, operands, attrs


def parse_hlo(text: str):
    """-> (entry instrs {name: Instr}, computations {name: [Instr]})."""
    computations, entry_name = {}, None
    cur, cur_name = None, None
    for line in text.splitlines():
        cm = COMP_RE.match(line)
        if cm:
            cur_name = cm.group(2)
            cur = []
            computations[cur_name] = cur
            if cm.group(1):
                entry_name = cur_name
            continue
        if line.startswith("}"):
            cur = None
            continue
        if cur is None:
            continue
        im = INSTR_RE.match(line)
        if not im:
            continue
        parts = split_instr(im.group(2))
        if parts is None:
            continue
        shape_str, opcode, operands, attrs = parts
        cur.append(
            Instr(im.group(1), opcode, parse_shapes(shape_str), operands, attrs)
        )
    entry = {i.name: i for i in computations.get(entry_name, [])}
    return entry, computations


def conv_flops(instr: Instr, by_name):
    """-> (flops, grouped): 2 * out_elems * effective-window * in-per-group.

    The window extent is capped by the LHS spatial extent: XLA:TPU
    canonicalizes 1x1 convs into a full-window/full-pad correlation form
    (window=HxW pad=(H-1)_(W-1), ``EmitAllBatchInSublanes``) where the
    literal window product overcounts FLOPs ~10^5x — only the overlap
    with the unpadded lhs contributes MACs.

    ``grouped`` is True for feature_group_count>1 (depthwise family):
    those contract 1-2 features per tap and cannot use the MXU — they
    run on the VPU and get a different compute roofline.
    """
    out_elems = 1
    for d in (instr.shapes[0].dims if instr.shapes else ()):
        out_elems *= d
    wm = re.search(r"window=\{[^}]*size=([\dx]+)", instr.attrs)
    win_dims = [int(s) for s in wm.group(1).split("x")] if wm else []
    dm = re.search(r"dim_labels=([\w]+)_([\w]+)->", instr.attrs)
    ipg = None
    lhs_spatial = []
    if dm:
        lhs_labels, rhs_labels = dm.group(1), dm.group(2)
        if len(instr.operands) >= 2:
            rhs = by_name.get(instr.operands[1])
            if rhs is not None and rhs.shapes:
                idx = rhs_labels.find("i")
                if 0 <= idx < len(rhs.shapes[0].dims):
                    ipg = rhs.shapes[0].dims[idx]
            lhs = by_name.get(instr.operands[0])
            if lhs is not None and lhs.shapes:
                # spatial label chars are digits, in window order
                lhs_spatial = [
                    lhs.shapes[0].dims[i]
                    for i, ch in enumerate(lhs_labels)
                    if ch.isdigit() and i < len(lhs.shapes[0].dims)
                ]
    win = 1
    for i, w in enumerate(win_dims):
        cap = lhs_spatial[i] if i < len(lhs_spatial) else w
        win *= min(w, cap)
    gm = re.search(r"feature_group_count=(\d+)", instr.attrs)
    grouped = bool(gm) and int(gm.group(1)) > 1
    return 2.0 * out_elems * win * (ipg if ipg else 1), grouped


def dot_flops(instr: Instr, by_name) -> float:
    out_elems = 1
    for d in (instr.shapes[0].dims if instr.shapes else ()):
        out_elems *= d
    k = 1
    cm = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", instr.attrs)
    lhs = by_name.get(instr.operands[0]) if instr.operands else None
    if cm and lhs is not None and lhs.shapes:
        for d in cm.group(1).split(","):
            if d:
                k *= lhs.shapes[0].dims[int(d)]
    return 2.0 * out_elems * k


def cost_of(instr: Instr, entry, computations) -> OpCost:
    c = OpCost()
    # HBM bytes: default-space operands (looked up at their definition,
    # where the memory space annotation lives) + default-space outputs
    for s in instr.shapes:
        if s.memspace == 0:
            c.hbm_bytes += s.bytes
    for o in instr.operands:
        d = entry.get(o)
        if d is None:
            continue
        for s in d.shapes:
            if s.memspace == 0:
                c.hbm_bytes += s.bytes
    # FLOPs from convs/dots: standalone or inside the called computation(s)
    body = []
    if instr.opcode in ("convolution", "dot"):
        body = [instr]
        scope = entry
    else:
        scope = {}
        for cname in re.findall(r"(?:calls|to_apply)=%?([\w.-]+)", instr.attrs):
            insts = computations.get(cname, [])
            body += [i for i in insts if i.opcode in ("convolution", "dot")]
            scope.update({i.name: i for i in insts})
    for b in body:
        if b.opcode == "convolution":
            f, grouped = conv_flops(b, scope)
            if grouped:
                c.vpu_flops += f
                c.notes.append("dwconv")
            else:
                c.flops += f
                c.notes.append("conv")
        else:
            c.flops += dot_flops(b, scope)
            c.notes.append("dot")
    return c


def load_trace(outdir: str):
    """-> ({op name: device us total}, n trace files note)."""
    files = sorted(
        glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        raise SystemExit(f"no trace under {outdir}")
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "Device" in n
    }
    # device pids carry one "XLA Modules" row (whole-program spans that
    # double-count every op) and one "XLA Ops" row — keep ops only
    tid_names = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    op_rows = {
        k for k, n in tid_names.items()
        if k[0] in device_pids and n == "XLA Ops"
    }
    module_rows = {
        k for k, n in tid_names.items()
        if k[0] in device_pids and n == "XLA Modules"
    }
    per_op = defaultdict(float)
    module_events = defaultdict(list)  # module name -> durations
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        key = (e["pid"], e.get("tid"))
        name, dur = e.get("name", ""), float(e.get("dur", 0.0))
        if key in module_rows:
            if name and dur > 0:
                module_events[name].append(dur)
            continue
        if op_rows and key not in op_rows:
            continue
        if name and dur > 0:
            per_op[name] += dur
    # exact profiled-call count: executions of the dominant module
    n_calls = 0
    if module_events:
        main = max(module_events, key=lambda k: sum(module_events[k]))
        n_calls = len(module_events[main])
    return per_op, n_calls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", required=True,
                    help="profile_step.py --outdir (trace + HLO dump)")
    ap.add_argument("--hlo", default="infer_hlo.txt",
                    help="HLO filename inside outdir (or absolute path)")
    ap.add_argument("--bw-gbs", type=float, default=540.0,
                    help="HBM roofline GB/s (measured stream rate)")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="bf16 MXU peak")
    ap.add_argument("--vpu-tflops", type=float, default=2.4,
                    help="VPU roofline for depthwise/grouped convs. The "
                    "default is the best rate XLA's depthwise emitter was "
                    "MEASURED to reach on this chip (C=256 dw, PERF.md r3) "
                    "— a best-demonstrated bound, not a theoretical one")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--calls", type=int, default=0,
                    help="profiled call count (0: report shares only)")
    args = ap.parse_args()

    hlo_path = args.hlo if os.path.isabs(args.hlo) else os.path.join(
        args.outdir, args.hlo)
    entry, computations = parse_hlo(open(hlo_path).read())
    per_op, trace_calls = load_trace(args.outdir)

    bw = args.bw_gbs * 1e9
    peak = args.peak_tflops * 1e12
    vpu_peak = args.vpu_tflops * 1e12
    rows, unmatched_us, total_us = [], 0.0, 0.0
    for name, us in per_op.items():
        total_us += us
        instr = entry.get(name) or entry.get(name.split("/")[-1])
        if instr is None:
            unmatched_us += us
            continue
        c = cost_of(instr, entry, computations)
        terms = {
            "hbm": c.hbm_bytes / bw,
            "mxu": c.flops / peak,
            "vpu": c.vpu_flops / vpu_peak,
        }
        kind = max(terms, key=terms.get)
        rows.append({
            "op": name, "us": us, "opcode": instr.opcode,
            "hbm_mb": c.hbm_bytes / 1e6,
            "gflop": (c.flops + c.vpu_flops) / 1e9,
            "bound_us": terms[kind] * 1e6,
            "kind": kind,
        })

    matched_us = sum(r["us"] for r in rows)
    # efficiency = roofline-bound time / measured time, per op. The bound_us
    # is per ONE call; trace us is summed over all profiled calls -> use
    # ratios only via per-op efficiency with call count, else normalize by
    # the op's own share (efficiency is call-count invariant when --calls
    # given; otherwise estimate calls from the most common integer ratio)
    calls = args.calls or trace_calls
    if not calls:
        cands = [r["us"] / r["bound_us"] for r in rows if r["bound_us"] > 0]
        cands.sort()
        # a memory-bound program has many ops AT the roofline: the lower
        # quartile ratio ~= call count (eff ~= 1 for the best ops)
        calls = max(1, round(cands[max(len(cands) // 4 - 1, 0)])) if cands else 1
        print(f"estimated profiled calls: {calls} "
              "(pass --calls to override)", file=sys.stderr)
    elif not args.calls:
        print(f"profiled calls from trace module row: {calls}",
              file=sys.stderr)
    for r in rows:
        r["eff"] = (r["bound_us"] * calls / r["us"]) if r["us"] else 0.0

    rows.sort(key=lambda r: -r["us"])
    print(f"device total {total_us/1e3:.1f} ms "
          f"(matched {matched_us/1e3:.1f} ms, "
          f"unmatched {unmatched_us/1e3:.1f} ms)")
    hdr = (f"{'us/call':>9} {'opcode':<14} {'kind':<4} {'MB':>8} "
           f"{'GFLOP':>8} {'eff':>5}  op")
    print(hdr)
    for r in rows[: args.top]:
        print(f"{r['us']/calls:9.1f} {r['opcode']:<14.14} {r['kind']:<4} "
              f"{r['hbm_mb']:8.1f} {r['gflop']:8.1f} {r['eff']:5.2f}  "
              f"{r['op']}")

    for thresh in (0.8, 0.6, 0.4):
        at = sum(r["us"] for r in rows if min(r["eff"], 1.0) >= thresh)
        print(f"share of matched device time at >= {int(thresh*100)}% of "
              f"roofline bound (BW {args.bw_gbs:.0f} GB/s): "
              f"{100 * at / max(matched_us, 1e-9):.1f}%")
    wsum = sum(min(r["eff"], 1.0) * r["us"] for r in rows)
    print(f"time-weighted mean roofline efficiency: "
          f"{100 * wsum / max(matched_us, 1e-9):.1f}%")
    print(json.dumps({
        "bw_gbs": args.bw_gbs, "calls": calls,
        "matched_ms": round(matched_us / 1e3, 1),
        "unmatched_ms": round(unmatched_us / 1e3, 1),
        "share_ge_80": round(sum(
            r["us"] for r in rows if min(r["eff"], 1.0) >= 0.8
        ) / max(matched_us, 1e-9), 4),
        "weighted_eff": round(wsum / max(matched_us, 1e-9), 4),
    }))


if __name__ == "__main__":
    main()
