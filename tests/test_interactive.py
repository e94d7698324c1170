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


def test_viewer_drag_look(sphere_scene):
    """Right-drag look (reference app.cpp:73-115): motion during a
    right-button drag turns the camera and restarts accumulation; motion
    without the button held does nothing."""
    tracer = PathTracer(sphere_scene, (16, 16), max_bounces=2)
    ctl = FirstPersonCameraController()
    viewer = InteractiveViewer(tracer, ctl)
    viewer.FRAME_BUDGET_S = 0.0
    viewer.step_frame()
    assert tracer.iteration > 0

    assert not viewer.on_mouse_motion(10.0, 10.0)  # no drag active
    viewer.on_mouse_press(100.0, 100.0, button=1)  # left button: ignored
    assert not viewer.on_mouse_motion(110.0, 100.0)

    viewer.on_mouse_press(100.0, 100.0, button=3)
    assert viewer.on_mouse_motion(150.0, 100.0)
    assert ctl.yaw < 0  # dragging right turns right
    assert tracer.iteration == 0  # camera move restarts accumulation

    # canvas y grows UP in matplotlib; dragging the cursor up must pitch up
    viewer.step_frame()
    assert viewer.on_mouse_motion(150.0, 140.0)
    assert ctl.pitch > 0
    viewer.on_mouse_release(button=3)
    assert not viewer.on_mouse_motion(0.0, 0.0)


def test_viewer_panel_options(sphere_scene):
    """Live parameter panel (reference gui.cpp:76-113, 167-206): denoiser
    knobs apply without restarting; the method combo restarts and the next
    frame really runs the other integrator (static jit key)."""
    tracer = PathTracer(sphere_scene, (16, 16), max_bounces=2)
    viewer = InteractiveViewer(tracer, FirstPersonCameraController())
    viewer.FRAME_BUDGET_S = 0.0
    img_mega = viewer.step_frame()

    viewer.set_option("denoiser_enabled", True)
    viewer.set_option("filter_size", 4)
    viewer.set_option("color_weight", 0.9)
    assert tracer.denoiser_enabled and tracer.filter_size == 4
    assert abs(tracer.color_weight - 0.9) < 1e-9
    img = viewer.step_frame()  # panel-enabled denoise path
    assert img.shape == (16, 16, 3)

    it_before = tracer.iteration
    assert it_before > 0
    viewer.set_option("method", "streaming")
    assert tracer.method == "streaming" and tracer.iteration == 0
    img_stream = viewer.step_frame()
    assert img_stream.shape == (16, 16, 3)

    try:
        viewer.set_option("method", "warp")
        raise AssertionError("unknown method accepted")
    except ValueError:
        pass
    try:
        viewer.set_option("no_such_knob", 1)
        raise AssertionError("unknown option accepted")
    except ValueError:
        pass


def test_viewer_preview_resolution_while_moving(sphere_scene):
    """Progressive-resolution preview (round-2 verdict #8): while the
    camera moves, step_frame renders ONE 1/PREVIEW_SCALE-resolution sample
    (a ~16x cheaper dispatch) and upscales it; the full-resolution
    accumulator does not advance.  Once idle, full-resolution progressive
    refinement resumes."""
    tracer = PathTracer(sphere_scene, (32, 32), max_bounces=2)
    ctl = FirstPersonCameraController(vfov=np.pi / 2)
    viewer = InteractiveViewer(tracer, ctl)
    viewer.FRAME_BUDGET_S = 0.0

    viewer.step_frame()
    assert tracer.iteration > 0

    assert viewer.on_key("w")  # camera motion: restart + mark moving
    assert viewer.moving
    img = viewer.step_frame()
    assert img.shape == (32, 32, 3)  # upscaled to display resolution
    assert tracer.iteration == 0  # full-res accumulator untouched
    assert viewer._preview is not None
    assert viewer._preview.width == 32 // viewer.PREVIEW_SCALE

    viewer._last_motion = -1e9  # idle again
    assert not viewer.moving
    viewer.step_frame()
    assert tracer.iteration > 0  # full-res refinement resumed


def test_motion_preview_fused_for_all_display_types(sphere_scene):
    """EVERY display buffer type's motion preview is the one-dispatch
    fused trace+tonemap (r3 verdict #10: normal/depth used to fall back
    to the unfused restart->trace->display path).  Asserted structurally:
    while moving, the preview tracer's accumulator never advances (the
    unfused path called path_trace, which does), and each type returns a
    correctly shaped uint8 frame matching the fused preview_frame."""
    tracer = PathTracer(sphere_scene, (32, 32), max_bounces=2)
    ctl = FirstPersonCameraController(vfov=np.pi / 2)
    viewer = InteractiveViewer(tracer, ctl)
    viewer.FRAME_BUDGET_S = 0.0

    assert viewer.on_key("w")
    assert viewer.moving
    for key, dtype in (("x", "final"), ("c", "color"), ("n", "normal"),
                       ("z", "depth")):
        assert viewer.on_key(key)
        assert viewer.display_type == dtype
        viewer._note_motion()
        img = viewer.step_frame()
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
        assert viewer._preview.iteration == 0, (
            f"{dtype} preview touched the accumulator (unfused path)"
        )
        pv = viewer._preview
        direct = pv.preview_frame(
            ctl.camera(), viewer.PREVIEW_MAX_BOUNCES, dtype
        )
        s = viewer.PREVIEW_SCALE
        np.testing.assert_array_equal(img[::s, ::s], direct)
