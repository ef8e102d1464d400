"""A/B: sort_key cand2 (nearest-two-cluster bundle key) vs cand0 on the
incoherent (brdf-proxy) and shadow-proxy ray classes at ladder scale.

Three recorded negatives (okey, hier, sc4) made the key cheaper/coarser
and lost to worse bundle composition; cand2 is the first RICHER key.
Bar: the incoherent class trace time with cand0 (r4 ladder brdf bar:
~391 ms / 2.07 M rays).

Run from /root/repo:  timeout 900 python scripts/cand2_ab.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from raytracer2_tpu.models import procedural as proc
    from raytracer2_tpu.render.app_bridge import make_tracers
    from raytracer2_tpu.scene import gltf
    from raytracer2_tpu.scene.scene import build_scene

    if args.quick:
        n = 512 * 512
        glb = proc.corridor_glb(segments=12, pillars_per_side=8,
                                lat=12, lon=16)
    else:
        n = 1920 * 1080
        glb = proc.corridor_glb(segments=24, pillars_per_side=12,
                                lat=34, lon=53)
    with tempfile.TemporaryDirectory() as tmp:
        p = Path(tmp) / "scene.glb"
        proc.write_glb(p, glb)
        scene = build_scene(gltf.load_file(p))

    rng = np.random.default_rng(5)
    lo = scene.host_tri_v0.min(axis=0)
    hi = scene.host_tri_v0.max(axis=0)
    o = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
    v = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))
    tn = jnp.zeros((n,), jnp.float32) + 1e-3
    tx = jnp.full((n,), 1e5, jnp.float32)

    print(f"tris={scene.num_triangles} rays={n}")

    results = {}
    for sk in ("cand0", "cand2"):
        tr = make_tracers(scene, use_bvh=True, backend="auto",
                          sort_key=None if sk == "cand0" else sk)
        f = jax.jit(lambda o_, d_, tn_, tx_, tr=tr: tr.closest_hit(
            o_, d_, tn_, tx_).t.sum())
        jax.block_until_ready(f(o, d, tn, tx))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(o, d, tn, tx))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        rec = tr.closest_hit(o, d, tn, tx)
        tri = np.asarray(rec.triangle_index)
        ovf = bool(np.asarray(tr.overflow_probe(o, d, tn, tx)))
        results[sk] = (ts, tri)
        print(f"  {sk}: min {ts[0]*1e3:8.1f} ms  med {ts[len(ts)//2]*1e3:8.1f} ms"
              f"  ({n / ts[0] / 1e6:.2f} Mrays/s)  overflow={ovf}")

    a, b = results["cand0"][1], results["cand2"][1]
    agree = float(np.mean(a == b))
    print(f"hit agreement cand0 vs cand2: {agree:.6f}")


if __name__ == "__main__":
    main()
