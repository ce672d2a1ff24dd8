#!/usr/bin/env python
"""Device-time breakdown of the cfg4 (sponza-class) production frame.

Captures a jax.profiler trace of one banded render_image frame (hall +
HDR sky, 960x540, depth 4, spp 8 — the BENCH cfg4 workload) and sums
device-stream durations by kernel, so the end-to-end Mrays/s number can
be split into: windowed closest sweep, windowed/plain occlusion sweep,
pdf probe, sort/argsort glue, integrator eval (fused XLA), and transfer.

Round-5 motivation: windowed kernel A/Bs are measured at the launch
level (tools/bench_windowed.py), but the e2e number (0.649 Mrays/s at
spp 8) sits well below the kernel-side estimate — this tool shows where
the remaining frame time actually goes before any further kernel work.

Usage: python tools/profile_cfg4.py [spp] [depth]
"""

import glob
import gzip
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VKRT_LOG_LEVEL", "ERROR")

import numpy as np  # noqa: E402


def classify(name: str) -> str:
    n = name.lower()
    if "wkernel" in n or "windowed" in n:
        return "windowed-sweep kernel"
    if "_kernel" in n or "packet" in n or "sweep" in n:
        return "packet-sweep kernel"
    if "pallas" in n or "custom-call" in n or "mosaic" in n or "tpu_custom_call" in n:
        return "pallas custom-call (unclassified)"
    if "sort" in n:
        return "argsort (coherence key)"
    if "gather" in n or "scatter" in n or "dynamic-update" in n:
        return "gather/scatter"
    if "fusion" in n or "loop" in n or "while" in n:
        return "fused XLA (integrator eval)"
    if "copy" in n or "transpose" in n or "bitcast" in n or "reshape" in n:
        return "layout/copy"
    if "infeed" in n or "outfeed" in n or "transfer" in n:
        return "host transfer"
    return "other"


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax

    from vulkan_raytracer_tpu.render.renderer import render_image
    from vulkan_raytracer_tpu.scene.camera import Camera
    from vulkan_raytracer_tpu.scene.procedural import hall_scene, sky_hdr

    s = hall_scene()
    s.skybox = sky_hdr()
    s.skybox_strength = 1.0
    t = s.upload()
    cam = Camera(position=np.array([-9.0, 1.8, 0.0]),
                 direction=np.array([1.0, 0.0, 0.0]))

    # compile + warm
    img, rays = render_image(t, cam, 960, 540, spp=spp, max_depth=depth,
                             as_uint8=True)
    jax.block_until_ready(img)

    tdir = tempfile.mkdtemp(prefix="vkrt_prof_")
    t0 = time.perf_counter()
    with jax.profiler.trace(tdir):
        img, rays = render_image(t, cam, 960, 540, spp=spp,
                                 max_depth=depth, as_uint8=True)
        jax.block_until_ready(img)
    wall = time.perf_counter() - t0
    print(f"frame wall {wall:.2f} s  {rays / wall / 1e6:.3f} Mrays/s "
          f"({int(rays)} rays)", flush=True)

    paths = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace found under {tdir}")
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    # Keep only device-stream complete events; host python/runtime rows
    # (thread names like 'python', 'plugin') would double-count.
    pid_name = {}
    tid_name = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"]["name"]
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_name[(ev["pid"], ev["tid"])] = ev["args"]["name"]

    def on_device(ev):
        p = pid_name.get(ev.get("pid"), "")
        return "TPU" in p or "/device" in p.lower()

    # Collect op-level device events per thread, then compute EXCLUSIVE
    # (self) time: outer rows like the banded-render `while` contain every
    # inner kernel as a nested complete event on the same thread, so raw
    # durations double-count (192% of wall observed) — subtract each
    # event's immediate children via a stack sweep over start-sorted rows.
    per_thread = defaultdict(list)
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or not on_device(ev):
            continue
        tname = tid_name.get((ev.get("pid"), ev.get("tid")), "")
        if "xla op" not in tname.lower():
            continue
        per_thread[(ev.get("pid"), ev.get("tid"))].append(
            (ev["ts"], ev["ts"] + ev.get("dur", 0), ev["name"])
        )

    by_class = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    for evs in per_thread.values():
        evs.sort(key=lambda e: (e[0], -(e[1] - e[0])))
        stack = []  # [start, end, name, child_us] — enclosing events
        for st, en, name in evs:
            while stack and stack[-1][1] <= st:
                s0, e0, n0, ch = stack.pop()
                self_s = (e0 - s0 - ch) / 1e6
                by_class[classify(n0)] += self_s
                by_name[n0] += self_s
                total += self_s
                if stack:
                    stack[-1][3] += e0 - s0
            stack.append([st, en, name, 0.0])
        while stack:
            s0, e0, n0, ch = stack.pop()
            self_s = (e0 - s0 - ch) / 1e6
            by_class[classify(n0)] += self_s
            by_name[n0] += self_s
            total += self_s
            if stack:
                stack[-1][3] += e0 - s0

    if total == 0.0:
        # fallback: some runtimes label threads differently; take the
        # busiest device thread instead
        per_thread = defaultdict(float)
        for ev in trace["traceEvents"]:
            if ev.get("ph") == "X" and on_device(ev):
                per_thread[(ev.get("pid"), ev.get("tid"))] += ev.get("dur", 0)
        if not per_thread:
            raise SystemExit("no device events in trace")
        busiest = max(per_thread, key=per_thread.get)
        for ev in trace["traceEvents"]:
            if (ev.get("ph") == "X"
                    and (ev.get("pid"), ev.get("tid")) == busiest):
                dur = ev.get("dur", 0) / 1e6
                total += dur
                by_class[classify(ev["name"])] += dur
                by_name[ev["name"]] += dur

    print(f"\ndevice busy {total:.2f} s ({100 * total / wall:.0f}% of wall)")
    print("\nby class:")
    for k, v in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"  {k:38s} {v:7.2f} s  {100 * v / total:5.1f}%")
    print("\ntop 15 ops:")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {v:7.2f} s  {100 * v / total:5.1f}%  {k[:90]}")


if __name__ == "__main__":
    main()
