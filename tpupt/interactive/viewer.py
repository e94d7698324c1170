"""Interactive-lite progressive viewer.

The reference's GLFW/ImGui app (src/interactive-app/) has no TPU analogue;
its *capabilities* — progressive refinement within a frame budget, restart
on camera move, denoiser toggle, display-buffer switching, FPS camera —
are exposed here over matplotlib (SURVEY.md §7 step 7).  Runs anywhere a
display (or Agg + saved frames) exists; the render itself runs on the TPU.

Keys: wasd/rf move · arrows look · space restart · n/c/z/x buffer select
      (final/color/normal/depth) · e toggle denoiser · q quit
"""

from __future__ import annotations

import time

import numpy as np

from tpupt.interactive.camera_controller import FirstPersonCameraController
from tpupt.render.progressive import PathTracer


class InteractiveViewer:
    FRAME_BUDGET_S = 0.016  # reference renders as many iterations as fit
    # in 16 ms per frame (src/interactive-app/app.cpp:149-154)

    def __init__(self, tracer: PathTracer, controller: FirstPersonCameraController):
        self.tracer = tracer
        self.controller = controller
        self.display_type = "final"
        self.denoise = False

    def step_frame(self) -> np.ndarray:
        """Progressively refine within the frame budget and return the
        current display image (the reference's App::run_cuda)."""
        camera = self.controller.camera()
        start = time.perf_counter()
        while True:
            self.tracer.path_trace(camera)
            if time.perf_counter() - start > self.FRAME_BUDGET_S:
                break
        if self.denoise:
            self.tracer.denoise(camera)
        return self.tracer.display(self.display_type)

    def on_key(self, key: str) -> bool:
        """Handle one key; returns False to quit."""
        if key == "q":
            return False
        if key == " ":
            self.tracer.restart()
        elif key in "wasdrf":
            self.controller.move(key, dt=0.1)
            self.tracer.restart()
        elif key in ("left", "right", "up", "down"):
            dx = {"left": -40, "right": 40}.get(key, 0)
            dy = {"up": -40, "down": 40}.get(key, 0)
            self.controller.on_mouse_move(dx, dy)
            self.tracer.restart()
        elif key == "e":
            self.denoise = not self.denoise
        elif key in "nczx":
            self.display_type = {
                "n": "normal", "c": "color", "z": "depth", "x": "final"
            }[key]
        return True

    def run(self, max_frames: int | None = None) -> None:
        """matplotlib event loop (requires a GUI backend)."""
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        im = ax.imshow(self.step_frame())
        ax.set_axis_off()
        state = {"running": True}

        def key_press(event):
            if not self.on_key(event.key or ""):
                state["running"] = False

        fig.canvas.mpl_connect("key_press_event", key_press)
        frames = 0
        while state["running"] and plt.fignum_exists(fig.number):
            im.set_data(self.step_frame())
            ax.set_title(f"iteration {self.tracer.iteration}")
            fig.canvas.draw_idle()
            plt.pause(0.001)
            frames += 1
            if max_frames is not None and frames >= max_frames:
                break
