"""t_max-ladder experiment on the production sorted hall bounce wave.

The measured bounce-wave ceiling is beam fatness driven by the running
max-t: a (8,128)-lane tile's beam extends to t = max over lanes of the
current best t, and every lane starts at t_max = 1e32 — so until EVERY
lane of a tile has found some hit, the tile walks a near-scene-sized
beam (measured ~58k triangles tested per tile for ~50 true hits).

The ladder bounds that worst case structurally: pass 1 traces with
t_max = r (every tile's beam is bounded by r by construction), lanes
that found a hit under r are final (a closest hit within the bound is
the global closest), and only the escapees — compacted, so they form
8x fewer tiles — re-walk with t in [r(1-eps), inf).

This tool measures, on the same wave as tools/bench_path_compare.py:
  * the hit-t distribution (what fraction of bounce rays are nearby
    hits — the ladder's win condition);
  * plain full-sweep baseline vs 2-rung ladders at several r, with
    exact-match verification against the baseline.

Run: ``python tools/bench_ladder.py [wave_scale]``.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from vulkan_raytracer_tpu.ops.math3 import V3
from vulkan_raytracer_tpu.ops import pallas_bvh as pk
from vulkan_raytracer_tpu.scene.procedural import hall_scene
from tools.bench_binned_sweep import build_wave


def full_trace(tables, o, d, n):
    tb, tri, _, _ = pk.packet_closest(
        tables, o, d, t_min=1e-4, t_max=1e32,
        active=jnp.ones((n,), bool),
    )
    return tb, tri


#: escapee counts are padded up to this granularity so jit programs are
#: shape-reused across ladder configs (axon recompiles cost 30-90 s)
PAD = 65536


def ladder_trace_host(tables, o, d, n, rungs):
    """Host-driven ladder with true compaction between rungs (each rung
    is its own jit call, lane count padded to PAD so shapes re-use).
    Returns (t, tri, per-pass ms list, escape fractions).
    """
    on = np.stack([np.asarray(c) for c in (o.x, o.y, o.z)], -1)
    dn = np.stack([np.asarray(c) for c in (d.x, d.y, d.z)], -1)
    t_out = np.full(n, np.inf, np.float32)
    tri_out = np.full(n, -1, np.int32)
    idx = np.arange(n)
    times, fracs = [], []
    lo = 1e-4

    @jax.jit
    def one(tables, ox, oy, oz, dx, dy, dz, act, lo, hi):
        return pk.packet_closest(
            tables, V3(ox, oy, oz), V3(dx, dy, dz),
            t_min=lo, t_max=hi, active=act,
        )

    for r in list(rungs) + [1e32]:
        m = len(idx)
        if m == 0:
            times.append(0.0)
            fracs.append(0.0)
            continue
        mp = -(-m // PAD) * PAD
        pad = mp - m

        def col(x):
            return jnp.asarray(np.pad(np.ascontiguousarray(x), (0, pad)))

        args = [col(x) for x in
                (on[idx, 0], on[idx, 1], on[idx, 2],
                 dn[idx, 0], dn[idx, 1], dn[idx, 2])]
        act = jnp.asarray(np.arange(mp) < m)
        out = one(tables, *args, act, lo, float(r))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = one(tables, *args, act, lo, float(r))
        jax.block_until_ready(out)
        times.append(1e3 * (time.perf_counter() - t0))
        tb_p, tri_p = np.asarray(out[0])[:m], np.asarray(out[1])[:m]
        hit = tri_p >= 0
        t_out[idx[hit]] = tb_p[hit]
        tri_out[idx[hit]] = tri_p[hit]
        idx = idx[~hit]
        fracs.append(len(idx) / n)
        lo = float(r) * (1.0 - 1e-3)
        if r >= 1e32:
            break
    return t_out, tri_out, times, fracs


def main():
    ws = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n = 512 * 512 * ws
    print("backend:", jax.default_backend(), "wave", n, flush=True)
    po, bd = build_wave(n)
    ov = V3(*(jnp.asarray(np.ascontiguousarray(po[:, k])) for k in range(3)))
    dv = V3(*(jnp.asarray(np.ascontiguousarray(bd[:, k])) for k in range(3)))
    tabs = hall_scene().upload()
    root_lo = np.asarray(tabs.bvh.aabb_min[0])
    root_hi = np.asarray(tabs.bvh.aabb_max[0])
    diag = float(np.linalg.norm(root_hi - root_lo))
    print(f"scene diag {diag:.2f}", flush=True)

    # ---- baseline + hit-t distribution --------------------------------
    f = jax.jit(lambda t, a, b: full_trace(t, a, b, n))
    out = f(tabs, ov, dv)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(tabs, ov, dv)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    tb, tri = np.asarray(out[0]), np.asarray(out[1])
    hit = tri >= 0
    ts = tb[hit & np.isfinite(tb)]
    print(
        f"baseline full sweep: {dt*1e3:8.1f} ms -> {n/dt/1e6:5.2f} Mrays/s | "
        f"hit rate {hit.mean():.2%}",
        flush=True,
    )
    qs = [10, 25, 50, 75, 90, 95, 99]
    print(
        "hit-t percentiles (fraction of diag):",
        {q: f"{np.percentile(ts, q)/diag:.3f}" for q in qs},
        flush=True,
    )

    # ---- ladders ------------------------------------------------------
    for alphas in ([0.05], [0.1], [0.2], [0.05, 0.2], [0.02, 0.1, 0.4]):
        rungs = [a * diag for a in alphas]
        t_l, tri_l, times, fracs = ladder_trace_host(tabs, ov, dv, n, rungs)
        ok = np.array_equal(tri_l, tri)
        tot = sum(times)
        print(
            f"ladder {[f'{a:g}' for a in alphas]}: {tot:8.1f} ms -> "
            f"{n/tot/1e3:5.2f} Mrays/s | passes "
            + " ".join(f"{t:.0f}ms" for t in times)
            + " | escape " + " ".join(f"{f:.1%}" for f in fracs)
            + f" | exact={ok}",
            flush=True,
        )
        if not ok:
            bad = np.nonzero(tri_l != tri)[0]
            print(f"  MISMATCH {len(bad)} lanes, first {bad[:5]}", flush=True)


if __name__ == "__main__":
    main()
