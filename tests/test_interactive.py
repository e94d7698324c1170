"""Interactive-layer tests: FPS camera controller math (reference
first_person_camera_controller.cpp) + the viewer's progressive frame loop
(headless, no GUI backend required for step_frame/on_key)."""

import numpy as np

from tpupt.interactive.camera_controller import FirstPersonCameraController
from tpupt.interactive.viewer import InteractiveViewer
from tpupt.render.progressive import PathTracer


def test_controller_look_and_pitch_clamp():
    c = FirstPersonCameraController()
    c.on_mouse_move(100.0, 0.0)
    assert c.yaw < 0  # dragging right turns right (yaw decreases)
    for _ in range(100):
        c.on_mouse_move(0.0, -10000.0)
    assert c.pitch <= np.pi / 2  # clamp (controller.cpp:39-42)
    cam = c.camera()
    m = np.asarray(cam.camera_matrix)
    # rotation stays orthonormal
    np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3), atol=1e-5)


def test_controller_moves_in_camera_frame():
    c = FirstPersonCameraController(speed=1.0)
    c.move("w", dt=1.0)
    np.testing.assert_allclose(c.position, [0, 0, -1], atol=1e-6)  # forward = -z
    c2 = FirstPersonCameraController(yaw=np.pi / 2, speed=1.0)
    c2.move("w", dt=1.0)
    np.testing.assert_allclose(c2.position, [-1, 0, 0], atol=1e-6)
    c3 = FirstPersonCameraController(speed=1.0)
    c3.move("r", dt=0.5)
    np.testing.assert_allclose(c3.position, [0, 0.5, 0], atol=1e-6)


def test_speed_log_scale():
    c = FirstPersonCameraController()
    c.set_speed_log(0.0)
    assert abs(c.speed - 1.0) < 1e-6
    c.set_speed_log(1.0)
    assert abs(c.speed - np.e) < 1e-6


def test_viewer_progressive_and_keys(sphere_scene):
    tracer = PathTracer(sphere_scene, (16, 16), max_bounces=2)
    ctl = FirstPersonCameraController(vfov=np.pi / 2)
    viewer = InteractiveViewer(tracer, ctl)
    viewer.FRAME_BUDGET_S = 0.0  # one iteration per frame in tests

    img = viewer.step_frame()
    assert img.shape == (16, 16, 3)
    it0 = tracer.iteration
    viewer.step_frame()
    assert tracer.iteration > it0

    # camera move restarts accumulation (reference app.cpp:49-71)
    assert viewer.on_key("w")
    assert tracer.iteration == 0
    viewer.step_frame()

    # display buffer cycling + denoise toggle + quit
    assert viewer.on_key("n") and viewer.display_type == "normal"
    assert viewer.on_key("z") and viewer.display_type == "depth"
    assert viewer.on_key("x") and viewer.display_type == "final"
    assert viewer.on_key("e") and viewer.denoise
    img = viewer.step_frame()  # denoised path
    assert img.shape == (16, 16, 3)
    assert viewer.on_key(" ") and tracer.iteration == 0
    assert not viewer.on_key("q")
