"""The analytic ICI scaling projection (benchmarks/ici_projection.py) is
recorded evidence for the SURVEY §2.4 north star — guard its model against
bit-rot: budgets must carry the Trainer's headroom semantics, the bf16 wire
must halve comm time, and efficiency must stay a valid ratio."""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "benchmarks")
)


def _project(headroom):
    from halo_volume import build_graph
    from ici_projection import project

    g = build_graph(6, shuffle=True, parts_lcm=8)
    return project(g, [2, 4, 8], headroom=headroom)


def test_projection_model_shape_and_bounds():
    out = _project(1.25)
    assert out["nodes"] == 216 and out["edges"] > 0
    assert [r["P"] for r in out["rows"]] == [2, 4, 8]
    for r in out["rows"]:
        # efficiency is a ratio of positive times; padding/imbalance and
        # comms keep it strictly under 1
        for k in r:
            if k.startswith("eff_"):
                assert 0.0 < r[k] < 1.0, (k, r[k])
        # bf16 wire ships exactly half the bytes of f32 (values are
        # rounded to 3 decimals, so allow the rounding slack)
        assert np.isclose(
            r["t_comm_bf16_alllinks_ms"] * 2,
            r["t_comm_f32_alllinks_ms"],
            atol=1.6e-3,
        )
        # the pessimistic single-link bound is 4x the 4-link bound
        assert np.isclose(
            r["t_comm_f32_1link_ms"],
            r["t_comm_f32_alllinks_ms"] * 4,
            atol=2.6e-3,
        )
    # per-part compute shrinks as P grows
    comps = [r["t_comp_ms"] for r in out["rows"]]
    assert comps == sorted(comps, reverse=True)


def test_projection_headroom_budgets():
    lean, padded = _project(1.0), _project(1.25)
    for r_lean, r_pad in zip(lean["rows"], padded["rows"]):
        # headroom pads both the wire budget and the per-part compute —
        # matching trainer.py _trial_budgets (round_up(1.25*b, 8) /
        # round_up(1.25*e, 128)), so the padded projection is never faster
        assert r_pad["halo_budget"] >= r_lean["halo_budget"]
        assert r_pad["t_comp_ms"] >= r_lean["t_comp_ms"]
        assert r_pad["eff_f32_alllinks"] <= r_lean["eff_f32_alllinks"]
