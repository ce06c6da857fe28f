"""Host-side input-pipeline throughput: per-item fetch and loader batches/s.

The TPU analog of the reference's informational pytest-benchmarks
(``tests/graphphysics/dataset/test_performance.py:88-101`` — dataset item
fetch and DataLoader throughput; no asserted thresholds there either).
Covers both dataset formats and the loader's prefetch/worker modes — the
numbers that matter when deciding whether training is input-bound:

    python benchmarks/dataset_throughput.py [--items N] [--workers W]

Prints one JSON line per configuration.

Reading the numbers: the loader's spawn worker pool PERSISTS across
epochs (startup ~1-2 s/worker paid once; 2026-08-21: a per-epoch pool
measured 1.8 batches/s on the default size vs 316 persistent — and 277
inline, so workers win even on cheap items once startup amortizes). The
workers/prefetch knobs matter most when items are expensive — large
meshes, k-hop expansion, world-edge kd-trees — i.e. exactly when the
device step would otherwise starve; raise --grid/--traj to model your
real pipeline before drawing conclusions.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time


def _time_items(ds, n: int) -> float:
    """Items/s over ``n`` sequential __getitem__ calls (after one warm call
    that materializes static budgets and trajectory caches)."""
    ds[0]
    idx = [i % len(ds) for i in range(n)]
    t0 = time.perf_counter()
    for i in idx:
        ds[i]
    return n / (time.perf_counter() - t0)


def _time_loader(ds, batch_size: int, prefetch: int, workers: int,
                 epochs: int = 2) -> float:
    from graphphysics_tpu.dataset import GraphLoader

    loader = GraphLoader(ds, batch_size=batch_size, shuffle=True,
                         prefetch=prefetch, num_workers=workers)
    n = 0
    next(iter(loader))  # warm: budgets, pools
    t0 = time.perf_counter()
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        for _ in loader:
            n += 1
    return n / (time.perf_counter() - t0)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--items", type=int, default=64)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--traj", type=int, default=4)
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--grid", type=int, nargs=2, default=(24, 18),
                   metavar=("NX", "NY"))
    args = p.parse_args()

    from graphphysics_tpu.dataset.h5_dataset import H5Dataset
    from graphphysics_tpu.dataset.xdmf_dataset import XDMFDataset
    from graphphysics_tpu.utils.synthetic import (
        write_cylinder_h5,
        write_panels_xdmf,
    )

    tmp = tempfile.mkdtemp(prefix="gp_ds_bench_")
    h5_path, h5_meta = write_cylinder_h5(
        tmp + "/h5", num_traj=args.traj, steps=args.steps,
        nx=args.grid[0], ny=args.grid[1],
    )
    xdmf_dir, xdmf_meta = write_panels_xdmf(
        tmp + "/xdmf", num_traj=args.traj, steps=args.steps,
        nx=args.grid[0], ny=args.grid[1],
    )

    results = []

    def record(name, value, unit="items/s"):
        row = {"metric": name, "value": round(value, 2), "unit": unit}
        results.append(row)
        print(json.dumps(row), flush=True)

    h5 = H5Dataset(h5_path=h5_path, meta_path=h5_meta)
    record("h5_item_fetch", _time_items(h5, args.items))
    xd = XDMFDataset(xdmf_folder=xdmf_dir, meta_path=xdmf_meta)
    record("xdmf_item_fetch", _time_items(xd, args.items))

    for workers in (0, args.workers):
        for prefetch in (0, 2):
            if workers and not prefetch:
                continue  # workers imply a prefetch window
            ds = H5Dataset(h5_path=h5_path, meta_path=h5_meta)
            bs = _time_loader(ds, args.batch_size, prefetch, workers)
            record(
                f"h5_loader_w{workers}_p{prefetch}", bs, unit="batches/s"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
