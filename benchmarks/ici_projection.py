"""Analytic ICI strong-scaling projection for edge-partitioned training.

Real multi-chip hardware is not reachable from the 1-chip tunnel, so the
>=80% ICI scaling north star (SURVEY §2.4; the reference is single-device,
`graphphysics/train.py` has no distributed path) cannot be *measured* here
— and the CPU virtual mesh is dispatch-bound, not comms-bound
(docs/scaling.md "Attributing the halo strong-scaling deficit").  This
script computes the next-best evidence: a fully parameterised projection
built ONLY from

  * measured comms volume — `parallel.halo_volume` on a hilbert-reordered
    synthetic tetra mesh: the budgeted boundary rows each device actually
    ships over the per-layer `all_to_all` (`ops/halo.py`), per wire dtype
    (f32 / `halo_dtype="bf16"`);
  * measured compute — the flagship EPD 15x128 train step's recorded
    best-window wall (BASELINE.json `step_ms_flagship`: 3.27 ms for a
    16,384-node / 98,304-edge batch), extrapolated by the model's exact
    per-layer MAC ratio (edge-MLP 98,304 MAC/edge vs node-MLP 81,920
    MAC/node at h=128, i.e. cost ∝ 1.2·E + N);
  * public TPU v5e ICI figures — 4 links/chip (2D torus), ~45 GB/s
    one-way per link (jax-ml.github.io/scaling-book): an OPTIMISTIC bound
    where the all_to_all saturates all links (180 GB/s egress) and a
    PESSIMISTIC bound where it rides one link (45 GB/s).

Using the BEST-window compute is the conservative choice for efficiency:
ICI bandwidth does not throttle with the shared MXU, so fast compute makes
the exchange relatively more expensive.

Model per device, P parts, L=15 layers, hidden F=128 (both the per-part
edge budget and the halo wire budget carry the Trainer's static
``partition_edge_headroom`` 1.25x — the padded slots are computed and
shipped for real, trainer.py `_trial_budgets`):
  t_comp(P)  = t_ref · (1.2·E_budget + N_local) / (1.2·E_ref + N_ref)
  bytes/layer = (P-1) · wire_budget · F · wire_bytes   (egress, = ingress)
  t_comm(P)  = L · 2 · bytes/layer / BW_egress          (fwd + bwd cotangent)
  efficiency  = t_1 / (P · (t_comp + t_comm))           (no-overlap; the
               overlap_exchange variant tends toward t_comp vs t_comm max)

Prints a table plus one JSON line for BASELINE.json.

    PYTHONPATH=/root/repo python benchmarks/ici_projection.py [--n 41]
"""

import argparse
import json
import os

import numpy as np

from graphphysics_tpu.parallel.reorder import (
    halo_volume,
    locality_permutation,
    permute_graph_np,
)

from halo_volume import build_graph  # noqa: E402  (benchmarks sibling)


def _flagship_ms() -> float:
    """Measured flagship reference point: read BASELINE.json's
    ``step_ms_flagship`` so a re-measured baseline re-calibrates the
    projection automatically; 3.27 is the recorded 2026-08-18 best."""
    path = os.path.join(os.path.dirname(__file__) or ".", "..",
                        "BASELINE.json")
    try:
        with open(path) as f:
            return float(json.load(f)["measured"]["step_ms_flagship"])
    except Exception:
        return 3.27


T_REF_MS = _flagship_ms()
E_REF, N_REF = 98_304, 16_384
LAYERS = 15
HIDDEN = 128
# exact per-layer MAC counts of the 15x128 EPD blocks: edge MLP
# (3h->h, h,h,h) = 98,304 MAC/edge; node MLP (2h->h, h,h,h) = 81,920
# MAC/node -> step cost ∝ 1.2*E + N (fwd+bwd folded into the calibration)
EDGE_WEIGHT = 1.2

ICI_LINK_GBPS = 45.0  # public v5e one-way per-link figure
ICI_LINKS = 4


def cost_units(e, n):
    return EDGE_WEIGHT * e + n


def project(g, parts_list, reorder="hilbert", headroom=1.25, measured=None):
    from graphphysics_tpu.core.graph import round_up

    perm = locality_permutation(
        g.senders, g.receivers, g.num_nodes,
        edge_mask=g.edge_mask, pos=g.pos, method=reorder,
    )
    g = permute_graph_np(g, perm)
    n = int(g.num_nodes)
    # the real step computes on PADDED edges (they flow through the edge
    # MLP masked), matching the flagship calibration point's static shape
    e = int(len(np.asarray(g.senders)))
    t1 = T_REF_MS * cost_units(e, n) / cost_units(E_REF, N_REF)

    rows = []
    receivers = np.asarray(g.receivers)
    edge_mask = np.asarray(g.edge_mask)
    for p in parts_list:
        hv = halo_volume(g, p)
        nl = n // p
        # straggler: the part owning the most edges sets the step wall;
        # the Trainer's static per-part budget carries
        # partition_edge_headroom (default 1.25, trainer.py) over the
        # canonical max — those padded slots are computed too
        owner = receivers[edge_mask] // nl
        e_local_max = int(np.bincount(owner, minlength=p).max())
        e_budget = round_up(int(e_local_max * headroom), 128)
        t_comp = T_REF_MS * cost_units(e_budget, nl) / cost_units(
            E_REF, N_REF
        )
        entry = {"P": p, "t1_ms": round(t1, 3),
                 "t_comp_ms": round(t_comp, 3)}
        # MEASURED compute (benchmarks/ici_tcomp_measure.py): the per-part
        # step executed on the REAL chip with the exchange stubbed; the
        # in-window ratio t_comp(P)/t_comp(base) replaces the MAC-linearity
        # assumption — the analytic column stays for comparison. Small-
        # shape inefficiency at high P shows up here and nowhere else.
        # base_P == 1 anchors at t1; a 1M-scale file (P=1 OOMs) anchors
        # its ratios at the ANALYTIC t_comp of its own base P.
        if measured is not None and p in measured["ratios"]:
            bp = measured["base_P"]
            if bp == 1:
                anchor = t1
            else:
                nl_b = n // bp
                owner_b = receivers[edge_mask] // nl_b
                e_b = round_up(
                    int(np.bincount(owner_b, minlength=bp).max() * headroom),
                    128,
                )
                anchor = T_REF_MS * cost_units(e_b, nl_b) / cost_units(
                    E_REF, N_REF
                )
            t_comp = anchor * measured["ratios"][p]
            entry["t_comp_measured_ratio"] = round(
                measured["ratios"][p], 4
            )
            entry["t_comp_measured_base_P"] = bp
            entry["t_comp_measured_ms"] = round(t_comp, 3)
        # likewise the uniform all_to_all ships the full headroomed wire
        # budget per pair regardless of real boundary content
        wire_budget = round_up(int(hv["halo_budget"] * headroom), 8)
        entry["halo_budget"] = wire_budget
        for wire, wb in (("f32", 4), ("bf16", 2)):
            bytes_layer = (p - 1) * wire_budget * HIDDEN * wb
            for bw_label, bw_gbps in (
                ("alllinks", ICI_LINK_GBPS * ICI_LINKS),
                ("1link", ICI_LINK_GBPS),
            ):
                t_comm = LAYERS * 2 * bytes_layer / (bw_gbps * 1e9) * 1e3
                eff = t1 / (p * (t_comp + t_comm))
                entry[f"t_comm_{wire}_{bw_label}_ms"] = round(t_comm, 3)
                entry[f"eff_{wire}_{bw_label}"] = round(eff, 3)
                # overlap mode (split-edge attention / SplitDense edge MLP,
                # ops/attention.py + models/layers.py): each layer's
                # collective hides under the local partial compute, so the
                # per-layer cost tends to max(t_comp, t_comm) instead of
                # the sum — the upper bound of XLA's latency-hiding win
                eff_ov = t1 / (p * max(t_comp, t_comm))
                entry[f"eff_{wire}_{bw_label}_overlap"] = round(eff_ov, 3)
        rows.append(entry)
    return {"nodes": n, "edges": e, "t1_ms": round(t1, 3),
            "reorder": reorder, "rows": rows,
            "compute_term": ("measured" if measured else "analytic")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=41,
                    help="tet grid side (n^3 nodes); 41 ~ aneurysm scale")
    ap.add_argument("--parts", type=int, nargs="+", default=[2, 4, 8, 16])
    ap.add_argument("--shuffled", action="store_true",
                    help="shuffle node numbering before the reorder "
                         "(adversarial input; hilbert recovers locality)")
    ap.add_argument("--headroom", type=float, default=1.25,
                    help="partition_edge_headroom applied to both the "
                         "per-part edge budget and the halo wire budget "
                         "(Trainer default 1.25)")
    ap.add_argument("--measured", default=None,
                    help="JSONL from benchmarks/ici_tcomp_measure.py: use "
                         "the measured in-window t_comp(P)/t_comp(1) ratios "
                         "as the compute term instead of the MAC-ratio "
                         "extrapolation (analytic column kept)")
    args = ap.parse_args()

    measured = None
    if args.measured:
        measured = {}
        base_p = 1
        with open(args.measured) as f:
            for line in f:
                row = json.loads(line)
                if row.get("event") == "summary":
                    base_p = int(row.get("ratio_base_P") or 1)
                    for r in row["rows"]:
                        if r.get("split"):
                            continue  # plain layout is the canonical term
                        # same-window interleaved-round median (new format);
                        # probe-normalized fallback for older files
                        ratio = (r.get("ratio_vs_p1")
                                 or r.get("ratio_vs_base")
                                 or r.get("ratio_vs_p1_probe_norm"))
                        if ratio:
                            measured[int(r["P"])] = float(ratio)
        # 1M-scale summaries ratio against the smallest P that FIT (P=1
        # OOMs there); anchor those ratios at the analytic t_comp of the
        # base P instead of t1
        measured = {"base_P": base_p, "ratios": measured}
        if base_p != 1 and base_p not in measured["ratios"]:
            raise SystemExit(
                f"--measured file ratios are relative to P={base_p}, "
                f"which is missing from its own rows — cannot anchor"
            )

    lcm = int(np.lcm.reduce(args.parts))
    g = build_graph(args.n, args.shuffled, parts_lcm=lcm)
    out = project(g, args.parts, headroom=args.headroom, measured=measured)
    out["assumptions"] = {
        "t_ref_ms": T_REF_MS, "e_ref": E_REF, "n_ref": N_REF,
        "layers": LAYERS, "hidden": HIDDEN,
        "ici_link_gbps": ICI_LINK_GBPS, "ici_links": ICI_LINKS,
        "exchanges_per_layer": 2, "headroom": args.headroom,
        "note": "best-window compute (conservative for efficiency: ICI "
                "does not throttle with the shared MXU); alllinks = "
                "all_to_all saturates the chip's 4-link egress, 1link = "
                "single-link pessimistic bound; no overlap "
                "(overlap_exchange moves each layer toward "
                "max(t_comp, t_comm)).",
    }

    hdr = (f"{'P':>3} {'halo_B':>7} {'t_comp':>8} {'t_meas':>8} "
           f"{'comm f32':>9} {'comm bf16':>9} "
           f"{'eff f32':>8} {'eff bf16':>8} {'eff ovl':>8}  (all-links)")
    print(f"# {out['nodes']} nodes / {out['edges']} edges, "
          f"t1 = {out['t1_ms']} ms ({out['reorder']} reorder, "
          f"{out['compute_term']} compute)")
    print(hdr)
    for r in out["rows"]:
        tm = r.get("t_comp_measured_ms", "-")
        print(f"{r['P']:>3} {r['halo_budget']:>7} {r['t_comp_ms']:>8} "
              f"{tm:>8} "
              f"{r['t_comm_f32_alllinks_ms']:>9} "
              f"{r['t_comm_bf16_alllinks_ms']:>9} "
              f"{r['eff_f32_alllinks']:>8} {r['eff_bf16_alllinks']:>8} "
              f"{r['eff_bf16_alllinks_overlap']:>8}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
