"""Per-event counters for the packet kernel on the real chip.

Prints total node visits, leaf visits, node-chunk refills and leaf DMAs
per trace for the bench_packet workloads, so the kernel cost model is
fitted to measured event counts rather than guesses.
Run: ``python tools/packet_stats.py [n_tris] [res]``.
"""

import sys
import types

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")

from vulkan_raytracer_tpu.accel.bvh import build_bvh
from vulkan_raytracer_tpu.ops.math3 import V3
from vulkan_raytracer_tpu.ops import pallas_bvh as pk
from tools.bench_packet import make_soup, camera_rays, random_rays


def stats_trace(tables, o, d, label):
    ov = V3(*(jnp.asarray(o[:, k]) for k in range(3)))
    dv = V3(*(jnp.asarray(d[:, k]) for k in range(3)))
    n = o.shape[0]
    act = jnp.ones((n,), bool)
    pb = tables.pbvh
    t_bound = jnp.full((n,), 1e32, jnp.float32)
    rays, t_init, _ = pk._prep_rays(ov, dv, jnp.where(act, t_bound, -1.0))
    t_lo = jnp.full(t_init.shape, 1e-4, jnp.float32)
    bounds, octs = pk._tile_beam_bounds(rays, t_init)
    _, _, st = pk._packet_sweep(
        (pb.nodes_f, pb.nodes_i, pb.leaves),
        bounds,
        octs,
        pk._full_lims(pb, bounds.shape[0]),
        rays,
        t_lo,
        t_init,
        int(pb.leaf_size),
        False,
        stats=True,
    )
    st = np.asarray(st)
    tiles = st.reshape(-1, 8, 128)[:, :4, 0]  # (T, 4)
    tot = tiles.sum(axis=0)
    t_cnt = tiles.shape[0]
    print(
        f"{label}: tiles={t_cnt} visits={tot[0]} ({tot[0]/t_cnt:.0f}/tile) "
        f"leafs={tot[1]} ({tot[1]/t_cnt:.0f}/tile) refills={tot[2]} "
        f"({tot[2]/t_cnt:.1f}/tile) leafdma={tot[3]} ({tot[3]/t_cnt:.1f}/tile)"
    )


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    v0, v1, v2 = make_soup(n_tris)
    bvh = build_bvh(v0, v1, v2)
    print(f"nodes={bvh.num_nodes} leaves={bvh.num_tri_slots // bvh.leaf_size}")
    tables = types.SimpleNamespace(
        bvh=bvh,
        pbvh=pk.build_packet_bvh(bvh),
        v0=V3(*(jnp.asarray(v0[:, k]) for k in range(3))),
        v1=V3(*(jnp.asarray(v1[:, k]) for k in range(3))),
        v2=V3(*(jnp.asarray(v2[:, k]) for k in range(3))),
    )
    o, d = camera_rays(res)
    stats_trace(tables, o, d, f"coherent rowmajor {res}x{res}")
    o, d = camera_rays(res, swizzle=True)
    stats_trace(tables, o, d, f"coherent 32x32-swizzled {res}x{res}")
    o, d = random_rays(res * res)
    stats_trace(tables, o, d, "incoherent")


if __name__ == "__main__":
    main()
