#!/usr/bin/env python
"""On-chip event counters for the tile-windowed treelet walk.

Runs the windowed sweep with the kernel's stats counters on the
production sorted bounce wave and fits the residual between measured
wall time and the round-2 cost model (~28 ns/node visit, ~280 ns/leaf
visit, ~2 us/HBM DMA) to the per-window event counts — locating the
round-4 sim-vs-realized gap (x1.63 predicted, x1.26 realized,
VERDICT r4 weak 4) instead of guessing.

Usage: python tools/windowed_kernel_stats.py [wave_scale] [treelet_tris ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.bench_binned_sweep import build_wave  # noqa: E402
from vulkan_raytracer_tpu.ops import pallas_bvh as pk  # noqa: E402
from vulkan_raytracer_tpu.ops.math3 import V3  # noqa: E402
from vulkan_raytracer_tpu.scene.procedural import hall_scene  # noqa: E402

NODE_NS, LEAF_NS, DMA_NS = 28.0, 280.0, 2000.0


def main():
    ws = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    tts = [int(x) for x in sys.argv[2:]] or [2048]
    n = 512 * 512 * ws
    po, bd = build_wave(n)
    ov = V3(*(jnp.asarray(np.ascontiguousarray(po[:, k])) for k in range(3)))
    dv = V3(*(jnp.asarray(np.ascontiguousarray(bd[:, k])) for k in range(3)))
    t_lo = jnp.full((n,), 1e-4, jnp.float32)
    t0 = jnp.full((n,), 1e32, jnp.float32)
    t0s = jnp.full((n,), 1.0, jnp.float32)

    for tt in tts:
        os.environ["VKRT_TREELET_TRIS"] = str(tt)
        tabs = hall_scene().upload()
        pb = tabs.pbvh
        print(f"--- treelet_tris {tt}: K={pb.n_treelets} ---", flush=True)
        for name, tl, ti, sh in (
            ("closest", t_lo, t0, False),
            ("shadow ", jnp.zeros((n,), jnp.float32), t0s, True),
        ):
            f = jax.jit(
                lambda o, d, tl=tl, ti=ti, sh=sh: pk._windowed_sweep(
                    pb, o, d, tl, ti, shadow=sh, stats=True
                )
            )
            out = f(ov, dv)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(3):
                s = time.perf_counter()
                out = f(ov, dv)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - s)
            st = np.asarray(out[3]).astype(np.int64)  # (tiles, 7)
            tiles = st.shape[0]
            mean = st.mean(0)
            nodes, leaves, culls, ndma, ldma, wents, wits = mean
            us_tile = best / tiles * 1e6
            model = (nodes * NODE_NS + leaves * LEAF_NS
                     + (ndma + ldma) * DMA_NS) / 1e3
            resid = us_tile - model
            print(
                f"{name}: {best * 1e3:8.1f} ms = {us_tile:7.1f} us/tile | "
                f"node {nodes:7.0f} leaf {leaves:6.0f} culls {culls:6.0f} "
                f"nodeDMA {ndma:5.0f} leafDMA {ldma:5.0f} "
                f"win {wents:5.0f}/{wits:5.0f}",
                flush=True,
            )
            print(
                f"         model {model:7.1f} us/tile, residual {resid:7.1f} "
                f"us/tile = {resid * 1e3 / max(culls, 1):6.0f} ns/cull "
                f"or {resid * 1e3 / max(wits, 1):6.0f} ns/window",
                flush=True,
            )


if __name__ == "__main__":
    main()
