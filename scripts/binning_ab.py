"""Measure the scalar scatter-chain rate that lower-bounds any Mosaic
binning kernel (VERDICT r4 #1; see ops/pallas_binning.py docstring for
the full argument), and compare against the XLA pair-binning floor and
the bundle-engine bar.

Run from /root/repo:  timeout 600 python scripts/binning_ab.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from raytracer2_tpu.ops.pallas_binning import scatter_rate_probe

    n = 1 << 22  # 4.2 M scatter steps ~ quick-scale pair count
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 256, n, dtype=np.int32))

    out = scatter_rate_probe(ids)
    np.asarray(out)  # force real completion (block_until_ready can lie
    # through this box's TPU relay — observed 0.0 ms "timings")
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(scatter_rate_probe(ids).sum())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    ns = ts[0] / n * 1e9
    print(f"scalar scatter chain: {ts[0]*1e3:.1f} ms for {n} steps "
          f"= {ns:.1f} ns/step")
    print(f"-> in-kernel counting sort lower bound at quick scale "
          f"(4.2 M pairs, ~2x work/pair): >= {2 * ns * 4.2e6 / 1e6:.0f} ms "
          f"(XLA floor ~75 ns/pair = 315 ms; bundle engine TOTAL: 55 ms)")
    print(f"-> at ladder cluster granularity (41 M pairs): "
          f">= {2 * ns * 41e6 / 1e6:.0f} ms (bundle engine bar: 391 ms)")


if __name__ == "__main__":
    main()
