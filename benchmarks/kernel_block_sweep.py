"""CSR attention kernel block-size sweep at aneurysm scale.

The kernel's per-chunk reductions are one-hot ``dot_general``s whose FLOPs
scale LINEARLY in ``block_nodes`` (every edge multiplies against a
``[BE, BN]`` ownership matrix), while smaller blocks mean more programs and
more DMA waits — this sweep finds the crossover on the real chip. Same
invocation => in-window ratios are meaningful at any throttle level.

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/kernel_block_sweep.py
"""

import itertools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from graphphysics_tpu.ops.attention import sparse_graph_attention
    from graphphysics_tpu.ops.pallas_attention import (
        compute_block_bounds,
        compute_max_chunks_bounds,
        csr_sparse_attention,
    )
    from graphphysics_tpu.utils.profiling import fetch_sync

    n, e, h, dh = 66560, 524288, 4, 16
    r = np.random.default_rng(0)
    senders = np.sort(r.integers(0, n, e)).astype(np.int32)
    receivers = r.integers(0, n, e).astype(np.int32)
    mask = r.random(e) > 0.05
    q = jnp.asarray(r.normal(size=(n, h, dh)).astype(np.float32))
    k = jnp.asarray(r.normal(size=(n, h, dh)).astype(np.float32))
    v = jnp.asarray(r.normal(size=(n, h, dh)).astype(np.float32))
    sj, rj, mj = map(jnp.asarray, (senders, receivers, mask))
    scale = h ** -0.5

    def timed(fn, q0, iters=20):
        out = fn(q0)
        fetch_sync(out[0, 0, 0])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            x = q0
            for _ in range(iters):
                x = fn(x)
            fetch_sync(x[0, 0, 0])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    xla_fn = jax.jit(lambda q: sparse_graph_attention(
        q, k, v, sj, rj, num_nodes=n, edge_mask=mj, scale=scale))
    xla_s = timed(xla_fn, q)
    print(json.dumps({"config": "xla_coo", "ms": round(xla_s * 1e3, 3)}),
          flush=True)

    for bn, be in itertools.product((64, 128, 256, 512), (256, 512, 1024)):
        bounds = compute_block_bounds(senders, n, block_nodes=bn)
        mc = compute_max_chunks_bounds(bounds, block_edges=be)
        oj = jnp.asarray(bounds)
        fn = jax.jit(lambda q, oj=oj, mc=mc, bn=bn, be=be:
                     csr_sparse_attention(
                         q, k, v, sj, rj, oj, edge_mask=mj, scale=scale,
                         block_nodes=bn, block_edges=be, max_chunks=mc))
        try:
            s = timed(fn, q)
        except Exception as ex:  # e.g. VMEM overflow at large blocks
            print(json.dumps({"config": f"bn{bn}_be{be}",
                              "error": str(ex).splitlines()[0][:160]}),
                  flush=True)
            continue
        print(json.dumps({
            "config": f"bn{bn}_be{be}",
            "ms": round(s * 1e3, 3),
            "vs_xla": round(s / xla_s, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
