"""CLI end-to-end tests (subprocess, the real user surface — reference
src/cli/cli.cpp + configurations.cpp)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, timeout=560):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, "-m", "tpupt.cli", *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


@pytest.fixture(scope="module")
def tiny_scene(tmp_path_factory):
    p = tmp_path_factory.mktemp("scene") / "tiny.json"
    p.write_text(json.dumps({
        "camera": {"vfov": 90, "resolution": [32, 24]},
        "sampler": {"samples": 2},
        "materials": [
            {"type": "lambertian", "name": "g", "albedo": [0.8, 0.8, 0.0]},
            {"type": "metal", "name": "m", "albedo": [0.9, 0.8, 0.7], "fuzz": 0.2},
        ],
        "surfaces": [
            {"type": "sphere", "transform": {"translate": [0, -100.5, -1]},
             "radius": 100.0, "material": "g"},
            {"type": "sphere", "transform": {"translate": [0, 0, -1]},
             "radius": 0.5, "material": "m"},
        ],
    }))
    return str(p)


def test_cli_renders_png_with_stats(tiny_scene, tmp_path):
    out = tmp_path / "out.png"
    stats = tmp_path / "stats.json"
    r = _run_cli([tiny_scene, "-o", str(out), "--max-bounces", "4",
                  "--stats-json", str(stats)])
    assert r.returncode == 0, r.stderr
    assert "Path tracing time:" in r.stdout  # stage stopwatch report
    assert "Mrays/s" in r.stdout
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (24, 32, 3)
    s = json.loads(stats.read_text())
    assert s["spp"] == 2 and s["resolution"] == [32, 24]
    assert s["rays"] > 32 * 24  # at least one bounce segment per pixel
    # steady-state throughput (excludes the first dispatch's one-time
    # program compile/load) is always reported
    assert s["mrays_per_sec_steady"] > 0
    assert s["first_dispatch_secs"] > 0

    # --spp override (reference scene_parser.cpp:15)
    r2 = _run_cli([tiny_scene, "-o", str(out), "--spp", "1",
                   "--max-bounces", "2", "--stats-json", str(stats)])
    assert r2.returncode == 0, r2.stderr
    assert json.loads(stats.read_text())["spp"] == 1


def test_cli_rejects_non_json(tmp_path):
    r = _run_cli(["scene.txt", "-o", str(tmp_path / "o.png")], timeout=60)
    assert r.returncode != 0
    assert "json" in (r.stderr + r.stdout).lower()


def test_cli_missing_scene(tmp_path):
    r = _run_cli(["nope_does_not_exist.json", "-o", str(tmp_path / "o.png")], timeout=60)
    assert r.returncode != 0
    assert "Cannot find scene file" in (r.stderr + r.stdout)
