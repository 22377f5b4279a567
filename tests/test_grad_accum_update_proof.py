"""Pin the single-update grad-accum equivalence proof (VERDICT r4 item 3).

The on-chip run (scripts/grad_accum_update_proof.py, ~45 min on the real
TPU) writes PROOFS/grad_accum_update_r5.json; this test pins the recorded
outcome so a regression in the accumulation path that invalidates the
recorded claim is caught the next time the proof is re-run, and the
committed evidence can't silently drift from what the docs assert.
"""

import json
from pathlib import Path

PROOF = (
    Path(__file__).resolve().parents[1] / "PROOFS" / "grad_accum_update_r5.json"
)


def test_single_update_proof_recorded():
    assert PROOF.exists(), "run scripts/grad_accum_update_proof.py on-chip"
    report = json.loads(PROOF.read_text())
    assert report["status"] == "ok", report.get("gates")
    assert all(report["gates"].values()), report["gates"]
    # the headline claim: machinery + math exact at flagship geometry
    ex = report["exact"]
    assert ex["grads"]["rel_l2"] <= 5e-3
    assert ex["grads"]["cosine"] >= 0.99999
    assert ex["updates"]["p50_absdiff_over_lr"] <= 0.05
    # the attribution rungs exist (loss batch-stats vs BN micro-stats)
    assert "loss_stats" in report and "flagship" in report
    assert "b5" in report["model"]
