import time

import numpy as np

from tpupt.utils.image import depth_to_uint8, linear_to_gamma, to_uint8
from tpupt.utils.timer import Stopwatch


def test_stopwatch_stages_and_report():
    sw = Stopwatch()
    sw.stage("a")
    time.sleep(0.01)
    sw.stage("b")
    time.sleep(0.01)
    sw.end_stage()
    names = [n for n, _ in sw.stages]
    assert names == ["a", "b"]
    assert all(s >= 0.01 for _, s in sw.stages)
    rep = sw.report()
    assert "a time:" in rep and "b time:" in rep and "Total time:" in rep


def test_to_uint8_gamma_and_clamp():
    img = np.array([[[0.0, 1.0, 2.0]]], np.float32)
    out = to_uint8(img)
    assert out.dtype == np.uint8
    assert out[0, 0, 0] == 0
    assert out[0, 0, 1] == 255
    assert out[0, 0, 2] == 255  # clamped
    # gamma 1/2.2: mid-gray lifts
    mid = to_uint8(np.array([[[0.5, 0.5, 0.5]]], np.float32))[0, 0, 0]
    assert abs(int(mid) - int(0.5 ** (1 / 2.2) * 255.99)) <= 1


def test_to_uint8_normal_remap():
    img = np.array([[[-1.0, 0.0, 1.0]]], np.float32)
    out = to_uint8(img, "neg1_1_to_0_1")
    assert out[0, 0, 0] == 0
    assert out[0, 0, 2] == 255


def test_depth_display_is_inverse():
    d = np.array([[1.0, 2.0]], np.float32)
    out = depth_to_uint8(d)
    assert out.shape == (1, 2, 3)
    assert out[0, 0, 0] > out[0, 1, 0]  # nearer = brighter


def test_linear_to_gamma_monotonic():
    x = np.linspace(0, 1, 16)
    g = linear_to_gamma(x)
    assert (np.diff(g) > 0).all()
