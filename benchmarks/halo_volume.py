"""Halo-volume study: locality-aware node reordering vs partition comms.

The hardware-independent comms-cost proxy for edge-partitioned training
(VERDICT r2 item 4): boundary rows each device ships per message-passing
layer (``parallel.halo_volume``), before and after ``partition_reorder``
methods, on:

- the structured synthetic aneurysm-class tetra topology (node numbering is
  already structured — the favourable case),
- the same topology with SHUFFLED node numbering (the adversarial case any
  real unstructured-mesh file can present),

at P = 4 and 8. Pure host-side numpy — runs anywhere.

    PYTHONPATH=/root/repo python benchmarks/halo_volume.py [--n 12]
"""

import argparse
import json

import numpy as np

from graphphysics_tpu.core.graph import pad_graph_np, round_up
from graphphysics_tpu.parallel.reorder import (
    halo_volume,
    locality_permutation,
    permute_graph_np,
)
from graphphysics_tpu.topology.build import cells_to_edges
from graphphysics_tpu.utils.synthetic import tet_grid


def build_graph(n_side: int, shuffle: bool, seed: int = 0, parts_lcm: int = 8):
    points, tets = tet_grid(n_side)
    if shuffle:
        rng = np.random.default_rng(seed)
        relabel = rng.permutation(len(points))
        inv = np.empty_like(relabel)
        inv[relabel] = np.arange(len(relabel))
        points = points[inv]
        tets = relabel[tets]
    s, r = cells_to_edges(tets)
    n = len(points)
    n_pad = round_up(n, parts_lcm)
    x = np.zeros((n, 4), np.float32)
    return pad_graph_np(
        x, points.astype(np.float32), s.astype(np.int32), r.astype(np.int32),
        n_pad, len(s) + 64, node_type_index=2,
    )


def study(g, parts):
    rows = {"identity": halo_volume(g, parts)}
    for method in ("rcm", "bfs", "hilbert"):
        perm = locality_permutation(
            g.senders, g.receivers, g.num_nodes,
            edge_mask=g.edge_mask, pos=g.pos, method=method,
        )
        rows[method] = halo_volume(permute_graph_np(g, perm), parts)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12,
                    help="tet grid side (n^3 nodes)")
    ap.add_argument("--hidden", type=int, default=128,
                    help="hidden size F for the per-layer BYTES figures "
                        "(each boundary row ships F activations)")
    args = ap.parse_args()

    # wire bytes per row element: halo_dtype=None ships f32 activations,
    # "bf16" (Trainer(halo_dtype="bf16") / ops.halo) halves the bytes with
    # f32 local math — comms volume is BYTES on the wire, not rows
    wire_bytes = {"f32": 4, "bf16": 2}

    out = {}
    for label, shuffle in (("structured", False), ("shuffled", True)):
        g = build_graph(args.n, shuffle)
        em = np.asarray(g.edge_mask)
        out[label] = {
            "nodes": int(g.num_nodes),
            "edges": int(em.sum()),
            "hidden": args.hidden,
            "partitions": {},
        }
        for p in (4, 8):
            rows = study(g, p)
            base = rows["identity"]["rows_exchanged_real"]
            out[label]["partitions"][p] = {
                m: {
                    "real_rows": v["rows_exchanged_real"],
                    "budgeted_rows": v["rows_exchanged_budgeted"],
                    "real_fraction": round(v["real_fraction"], 4),
                    "reduction_vs_identity": round(
                        1.0 - v["rows_exchanged_real"] / max(base, 1), 4
                    ),
                    # per message-passing LAYER, across all devices
                    "layer_bytes_per_dtype": {
                        d: int(
                            v["rows_exchanged_budgeted"] * args.hidden * bpe
                        )
                        for d, bpe in wire_bytes.items()
                    },
                }
                for m, v in rows.items()
            }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
