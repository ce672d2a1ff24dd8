"""Dynamic-scene support: re-upload == AccelerationStructure::rebuild.

The reference exposes rebuild()/update() for mutated scenes
(accelerationstructure.cpp:26-32); our equivalent re-flattens on
Scene.upload().  Moving a node must change the render."""

import numpy as np

from vulkan_raytracer_tpu.render.renderer import render_image
from vulkan_raytracer_tpu.scene.builtin import cornell_box_scene
from vulkan_raytracer_tpu.scene.camera import Camera


def test_rebuild_after_node_transform():
    s = cornell_box_scene()
    cam = Camera(
        position=np.array([0.0, 1.0, 2.4]), direction=np.array([0.0, 0.0, -1.0])
    )
    img_a, _ = render_image(s.upload(), cam, 24, 24, spp=2, max_depth=2, tonemap=False)

    # push the tall box through the scene and rebuild (node 6 = tall box)
    tall = s.root.children[5]
    tall.local_transform = tall.local_transform.copy()
    tall.local_transform[0, 3] += 0.7
    # recompute world transforms down the tree
    for node in s.iter_depth_first():
        if node.parent is not None:
            node.world_transform = (
                node.parent.world_transform @ node.local_transform
            ).astype(np.float32)
    img_b, _ = render_image(s.upload(), cam, 24, 24, spp=2, max_depth=2, tonemap=False)
    assert np.abs(img_a - img_b).max() > 1e-3
