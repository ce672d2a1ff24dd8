"""Hardware smoke: drive every traversal dispatch band on the real chip.

Motivation (round 3): the Pallas any-hit occlusion kernel carried an i1
mask through its >64-triangle ``fori_loop``; Mosaic's interpret mode
accepts that, the real TPU compiler does not ("failed to legalize
operation 'scf.for'"), so every 65..1024-triangle no-alpha scene crashed
at compile time on hardware while the whole CPU test suite stayed green.
Interpret-mode equivalence tests CANNOT catch legalization failures —
only a compile on the hardware target can.  This tool is that compile:
one tiny render per dispatch band (plus direct kernel-vs-oracle checks),
~2 minutes on chip, run it after touching any kernel or dispatch code:

    python tools/hw_smoke.py          # on the TPU host

Bands map to the integrator dispatch (render/integrator.py:_closest_opaque
and the matching shadow/pdf dispatchers):

  smem-sweep      <= 64 tris fully-unrolled Pallas dense (Cornell)
  pallas-dense    65..1024 tris: fori_loop Pallas closest/shadow/pdf
  xla-dense       1k..DENSE_MAX_TRIS: XLA triangles-major fold
  packet          > DENSE_MAX_TRIS: Pallas beam kernel (forced small here)
  instanced       TLAS scan with per-prototype packet BLAS
  sharded-windowed  render_image_sharded on a 1-device mesh with the
                    tile-windowed treelet walk engaged (round 5)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _soup_scene(n_tris: int, emissive_tris: int = 0, seed: int = 2):
    import numpy as np

    from vulkan_raytracer_tpu.scene.scenegraph import Material, Primitive, Scene

    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1, 1, (n_tris, 1, 3))
    verts = (centers + rng.uniform(-0.2, 0.2, (n_tris, 3, 3))).astype(np.float32)
    pos = verts.reshape(-1, 3)
    e1 = pos[1::3] - pos[0::3]
    e2 = pos[2::3] - pos[0::3]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    nrm = np.repeat(n, 3, axis=0).astype(np.float32)

    s = Scene()
    em = Material()
    em.emissive_factor = np.array([4.0, 3.5, 3.0], np.float32)
    em.metallic_factor = 0.0
    grey = Material()
    grey.metallic_factor = 0.0
    grey.roughness_factor = 0.8
    s.materials += [em, grey]

    def prim(p, nn, mat):
        nv = p.shape[0]
        return Primitive(
            positions=p, normals=nn,
            tangents=np.zeros((nv, 4), np.float32),
            uvs=np.zeros((nv, 2), np.float32),
            indices=np.arange(nv, dtype=np.uint32), material=mat,
        )

    # first `emissive_tris` triangles emit; the rest are diffuse grey
    ne = min(emissive_tris, n_tris)
    if ne:
        s.mesh_pool.append([prim(pos[: 3 * ne], nrm[: 3 * ne], 0)])
    if ne < n_tris:
        s.mesh_pool.append([prim(pos[3 * ne :], nrm[3 * ne :], 1)])
    floor = np.array(
        [[-8, -2, -8], [8, -2, -8], [8, -2, 8], [-8, -2, 8]], np.float32
    )
    fp = floor[[0, 2, 1, 0, 3, 2]]
    s.mesh_pool.append(
        [prim(fp, np.tile(np.array([0, 1, 0], np.float32), (6, 1)), 1)]
    )
    eye = np.eye(4, dtype=np.float32)
    for mesh in range(len(s.mesh_pool)):
        s.add_node(s.root, eye, mesh=mesh)
    return s


def _render(tables, label: str):
    import numpy as np

    from vulkan_raytracer_tpu.render.renderer import render_image
    from vulkan_raytracer_tpu.scene.camera import Camera

    cam = Camera(
        position=np.array([0.0, 0.5, 5.0]), direction=np.array([0.0, -0.1, -1.0])
    )
    img, rays = render_image(tables, cam, 48, 48, spp=2, max_depth=3, tonemap=False)
    img = np.asarray(img)
    assert np.isfinite(img).all(), f"{label}: non-finite radiance"
    assert img.mean() > 1e-5, f"{label}: black frame"
    print(f"  {label}: OK (mean {img.mean():.4f}, {int(rays)} rays)")


def main() -> int:
    import jax

    print(f"backend: {jax.default_backend()}")
    if jax.default_backend() not in ("tpu",):
        print("WARNING: not on TPU — this smokes the current backend only;")
        print("the Mosaic legalization class this tool exists for needs chip.")

    from vulkan_raytracer_tpu.scene.builtin import cornell_box_scene

    print("[1/7] smem-sweep band (Cornell, 36 tris)")
    _render(cornell_box_scene().upload(), "smem-sweep")

    print("[2/7] pallas-dense fori band (200 tris, 150 emissive: closest+shadow+pdf)")
    _render(_soup_scene(200, emissive_tris=150).upload(), "pallas-dense")

    print("[3/7] xla-dense band (2k tris)")
    _render(_soup_scene(2000, emissive_tris=40).upload(), "xla-dense")

    print("[4/7] packet band (Cornell forced through the beam kernel)")
    os.environ["VKRT_FORCE_PACKET"] = "1"
    try:
        _render(cornell_box_scene().upload(), "packet")
    finally:
        del os.environ["VKRT_FORCE_PACKET"]

    print("[5/7] instanced packet BLAS (100-tri prototype x4, threshold 50)")
    from vulkan_raytracer_tpu.scene import scenegraph as sg

    old = sg.DENSE_MAX_TRIS
    sg.DENSE_MAX_TRIS = 50
    try:
        s = _soup_scene(120, emissive_tris=20)
        for k in range(3):  # 3 more instances of the big soup prototype
            m = np.eye(4, dtype=np.float32)
            m[:3, 3] = (1.5 * (k + 1), 0.1 * k, -0.8 * k)
            s.add_node(s.root, m, mesh=1)  # mesh 1: the 100-tri grey soup
        _render(s.upload(instancing=True), "instanced-packet")
    finally:
        sg.DENSE_MAX_TRIS = old

    print("[6/7] pallas_shadow vs dense_shadow (the round-3 regression)")
    import types

    import jax.numpy as jnp

    from vulkan_raytracer_tpu.ops.dense import dense_shadow
    from vulkan_raytracer_tpu.ops.math3 import V3
    from vulkan_raytracer_tpu.ops.pallas_dense import pallas_shadow

    rng = np.random.default_rng(0)
    nt = 200
    verts = rng.uniform(-1, 1, (nt, 3, 3))

    def col(a):
        return jnp.asarray(np.ascontiguousarray(a).astype(np.float32))

    tbl = types.SimpleNamespace(
        v0=V3(col(verts[:, 0, 0]), col(verts[:, 0, 1]), col(verts[:, 0, 2])),
        v1=V3(col(verts[:, 1, 0]), col(verts[:, 1, 1]), col(verts[:, 1, 2])),
        v2=V3(col(verts[:, 2, 0]), col(verts[:, 2, 1]), col(verts[:, 2, 2])),
        num_triangles=nt, has_alpha=False,
    )
    n = 256
    o = rng.normal(size=(3, n)).astype(np.float32) * 2
    d = rng.normal(size=(3, n)).astype(np.float32)
    ov = V3(col(o[0]), col(o[1]), col(o[2]))
    dv = V3(col(d[0]), col(d[1]), col(d[2]))
    act = jnp.ones((n,), bool)
    occ_p = np.asarray(pallas_shadow(tbl, ov, dv, t_max=50.0, active=act))
    occ_d = np.asarray(dense_shadow(tbl, ov, dv, t_max=50.0, active=act))
    assert (occ_p == occ_d).all(), "pallas_shadow != dense_shadow"
    print(f"  kernel-equivalence: OK ({int(occ_p.sum())}/{n} occluded)")

    print("[7/7] sharded windowed render (1-device mesh, multi-treelet packet)")
    # Round-5 (VERDICT r4 item 7): the production multi-chip path must
    # compile + execute on chip with the tile-windowed treelet walk — the
    # default big-scene traversal — engaged.  Force the packet path on a
    # mid-size soup and cut treelets small so n_treelets > 1.
    from vulkan_raytracer_tpu.parallel.sharding import (
        make_mesh,
        render_image_sharded,
    )
    from vulkan_raytracer_tpu.render.renderer import render_image
    from vulkan_raytracer_tpu.scene.camera import Camera

    os.environ["VKRT_FORCE_PACKET"] = "1"
    os.environ["VKRT_TREELET_TRIS"] = "1024"
    try:
        tbl7 = _soup_scene(6000, emissive_tris=60, seed=7).upload()
        assert tbl7.pbvh.n_treelets > 1, (
            f"expected multi-treelet packet BVH, got {tbl7.pbvh.n_treelets}"
        )
        cam = Camera(
            position=np.array([0.0, 0.5, 5.0]),
            direction=np.array([0.0, -0.1, -1.0]),
        )
        mesh = make_mesh(jax.devices()[:1])
        img_s, rays_s = render_image_sharded(
            tbl7, cam, 48, 48, spp=2, max_depth=3, mesh=mesh, tonemap=False
        )
        img_s = np.asarray(img_s)
        assert np.isfinite(img_s).all(), "sharded-windowed: non-finite radiance"
        assert img_s.mean() > 1e-5, "sharded-windowed: black frame"
        img_p, _ = render_image(
            tbl7, cam, 48, 48, spp=2, max_depth=3, tonemap=False
        )
        rmse = float(np.sqrt(np.mean((img_s - np.asarray(img_p)) ** 2)))
        assert rmse < 1e-5, f"sharded-windowed vs plain RMSE {rmse:.2e}"
        print(
            f"  sharded-windowed: OK ({tbl7.pbvh.n_treelets} treelets, "
            f"mean {img_s.mean():.4f}, {int(rays_s)} rays, "
            f"RMSE vs plain {rmse:.2e})"
        )
    finally:
        del os.environ["VKRT_FORCE_PACKET"]
        del os.environ["VKRT_TREELET_TRIS"]

    print("hw_smoke: ALL BANDS PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
