"""Interactive progressive viewer in the terminal.

The reference's render loop presents to a GLFW/Vulkan swapchain with WASD
movement, mouse panning, and progressive accumulation that resets on camera
moves (application.cpp:346-408, camera.cpp:18-60, raytracer.cpp:501-535).
A TPU host has no swapchain; this viewer keeps the exact same loop contract
— poll input, draw one progressive sample, present, reset on move — and
presents with ANSI truecolor half-blocks (two pixels per character cell).

Keys: w/a/s/d move (shift-style boost with W/A/S/D, 0.2x with z held
semantics replaced by lowercase/uppercase), i/j/k/l pan, +/- fov,
[ ] speed, q quit.
"""

from __future__ import annotations

import select
import sys
import time

import numpy as np

from .render.renderer import Renderer
from .utils import logging as log


def _read_keys(timeout: float = 0.0) -> str:
    if not sys.stdin.isatty():
        return ""
    r, _, _ = select.select([sys.stdin], [], [], timeout)
    return sys.stdin.read(1) if r else ""


def _present(img: np.ndarray) -> str:
    """(H, W, 3) uint8 -> ANSI half-block framebuffer string."""
    h = img.shape[0] - (img.shape[0] % 2)
    rows = []
    for y in range(0, h, 2):
        top = img[y]
        bot = img[y + 1]
        cells = []
        for x in range(img.shape[1]):
            tr, tg, tb = (int(c) for c in top[x])
            br, bg, bb = (int(c) for c in bot[x])
            cells.append(f"\x1b[38;2;{tr};{tg};{tb}m\x1b[48;2;{br};{bg};{bb}m▀")
        rows.append("".join(cells) + "\x1b[0m")
    return "\n".join(rows)


def run_viewer(tables, camera, width: int = 128, height: int = 96, max_depth: int = 4):
    """Progressive interactive loop (q to quit).  Requires a tty."""
    import termios
    import tty

    if not sys.stdin.isatty():
        raise RuntimeError("interactive viewer needs a tty")
    renderer = Renderer(tables, camera, width, height, max_depth)
    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    tty.setcbreak(fd)
    sys.stdout.write("\x1b[2J")  # clear
    last = time.perf_counter()
    try:
        while True:
            now = time.perf_counter()
            dt = now - last
            last = now

            key = _read_keys()
            if key == "q":
                break
            moves = {
                "w": {"w"}, "s": {"s"}, "a": {"a"}, "d": {"d"},
                "W": {"w", "shift"}, "S": {"s", "shift"},
                "A": {"a", "shift"}, "D": {"d", "shift"},
            }
            if key in moves:
                camera.process_key_input(moves[key], max(dt, 1 / 30))
            elif key == "i":
                camera.cursor_moved(0, -40, left=True)
            elif key == "k":
                camera.cursor_moved(0, 40, left=True)
            elif key == "j":
                camera.cursor_moved(-40, 0, left=True)
            elif key == "l":
                camera.cursor_moved(40, 0, left=True)
            elif key in "+=":
                camera.cursor_moved(0, -10, right=True)
            elif key == "-":
                camera.cursor_moved(0, 10, right=True)
            elif key == "[":
                camera.speed *= 0.5
            elif key == "]":
                camera.speed *= 2.0

            t0 = time.perf_counter()
            img = renderer.draw_frame()
            frame_ms = 1e3 * (time.perf_counter() - t0)
            sys.stdout.write("\x1b[H")  # home
            sys.stdout.write(_present(img))
            sys.stdout.write(
                f"\n\x1b[0m spp {renderer.sample_count:4d}  {frame_ms:6.1f} ms/frame"
                f"  pos ({camera.position[0]:.2f} {camera.position[1]:.2f}"
                f" {camera.position[2]:.2f})  [wasd move, ijkl pan, +- fov, q quit]\x1b[K"
            )
            sys.stdout.flush()
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)
        sys.stdout.write("\x1b[0m\n")
    log.info("viewer closed after %d samples, %d rays", renderer.sample_count, renderer.total_rays)
