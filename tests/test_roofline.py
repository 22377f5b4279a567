"""Parser tests for scripts/roofline_share.py (offline HLO/trace analyzer).

The analyzer backs the PERF.md roofline-share claim, so its byte/FLOP
accounting is tested against a hand-written scheduled-HLO snippet with
known sizes (incl. the S(1) VMEM annotation that must NOT count as HBM)
and against a real compiled program's text.
"""

import importlib.util
import sys
from pathlib import Path

import pytest

_spec = importlib.util.spec_from_file_location(
    "roofline_share",
    Path(__file__).resolve().parents[1] / "scripts" / "roofline_share.py",
)
rs = importlib.util.module_from_spec(_spec)
sys.modules["roofline_share"] = rs  # dataclasses resolves via sys.modules
_spec.loader.exec_module(rs)


HLO = """\
HloModule jit_f, is_scheduled=true

%fused_computation.1 (param_0.1: bf16[8,16,16,32], param_1.1: bf16[3,3,1,32]) -> bf16[8,16,16,32] {
  %param_0.1 = bf16[8,16,16,32]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %param_1.1 = bf16[3,3,1,32]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  %convolution.5 = bf16[8,16,16,32]{3,2,1,0:T(8,128)(2,1)} convolution(%param_0.1, %param_1.1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f, feature_group_count=32
  ROOT %tanh.1 = bf16[8,16,16,32]{3,2,1,0:T(8,128)(2,1)} tanh(%convolution.5)
}

ENTRY %main.1 (x.1: bf16[8,16,16,32], w.1: bf16[3,3,1,32]) -> bf16[8,16,16,32] {
  %x.1 = bf16[8,16,16,32]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %w.1 = bf16[3,3,1,32]{3,2,1,0:T(8,128)(2,1)S(1)} parameter(1)
  %fusion.1 = bf16[8,16,16,32]{3,2,1,0:T(8,128)(2,1)} fusion(%x.1, %w.1), kind=kOutput, calls=%fused_computation.1
  ROOT %copy.1 = bf16[8,16,16,32]{2,3,1,0:T(8,128)(2,1)} copy(%fusion.1)
}
"""


def test_parse_entry_and_bytes():
    entry, comps = rs.parse_hlo(HLO)
    assert set(entry) == {"x.1", "w.1", "fusion.1", "copy.1"}
    # x: 8*16*16*32 * 2B = 131072 B in default space
    assert entry["x.1"].shapes[0].bytes == 131072
    assert entry["x.1"].shapes[0].memspace == 0
    # w is VMEM-annotated
    assert entry["w.1"].shapes[0].memspace == 1


def test_fusion_cost_excludes_vmem_operand():
    entry, comps = rs.parse_hlo(HLO)
    c = rs.cost_of(entry["fusion.1"], entry, comps)
    # HBM = x (read) + output (write); w lives in VMEM -> excluded
    assert c.hbm_bytes == 131072 * 2
    # depthwise conv: 2 * out_elems * 3*3 * i(=1) — VPU-classed (grouped
    # convs contract one feature per tap; the MXU can't help)
    assert c.vpu_flops == 2 * (8 * 16 * 16 * 32) * 9 * 1
    assert c.flops == 0


def test_copy_cost_read_write():
    entry, comps = rs.parse_hlo(HLO)
    c = rs.cost_of(entry["copy.1"], entry, comps)
    assert c.hbm_bytes == 131072 * 2
    assert c.flops == 0


CANONICAL_1X1 = """\
HloModule jit_g, is_scheduled=true

ENTRY %main.2 (k.1: bf16[1,1,32,16], a.1: bf16[8,16,16,32]) -> bf16[16,16,16,8] {
  %k.1 = bf16[1,1,32,16]{2,3,1,0:T(8,128)(2,1)} parameter(0)
  %a.1 = bf16[8,16,16,32]{0,3,2,1:T(8,128)(2,1)} parameter(1)
  ROOT %convolution.9 = bf16[8,16,16,16]{0,3,2,1:T(8,128)(2,1)} convolution(%k.1, %a.1), window={size=16x16 pad=15_15x15_15 rhs_reversal=1x1}, dim_labels=01fb_o01i->f01b
}
"""


def test_canonical_full_window_conv_flops():
    """XLA:TPU's 1x1-conv canonical form (window = rhs spatial extent,
    pad = extent-1) must NOT count the literal window product: the
    effective window is capped by the lhs spatial extent (1x1 here)."""
    entry, comps = rs.parse_hlo(CANONICAL_1X1)
    c = rs.cost_of(entry["convolution.9"], entry, comps)
    # 2 * out_elems * eff_window(1) * i(=32)
    assert c.flops == 2 * (8 * 16 * 16 * 16) * 1 * 32
    assert c.vpu_flops == 0


def test_parse_real_compiled_program():
    """End-to-end on whatever backend is present: the parser must digest a
    real compiled module and find the conv FLOPs."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    def f(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.tanh(y) + 1.0

    x = jnp.ones((2, 16, 16, 8), jnp.bfloat16)
    w = jnp.ones((3, 3, 8, 8), jnp.bfloat16)
    txt = jax.jit(f).lower(x, w).compile().as_text()
    entry, comps = rs.parse_hlo(txt)
    assert entry, "no ENTRY instructions parsed"
    total_flops = sum(
        rs.cost_of(i, entry, comps).flops for i in entry.values()
    )
    # 2 * out_elems * 3*3 * cin(8) = 2*2*16*16*8*9*8
    assert total_flops == 2 * (2 * 16 * 16 * 8) * 9 * 8
