"""Generated stand-in model assets.

The reference's OBJ models are git-LFS pointers only (SURVEY.md §2.4), so
the shipped scene JSONs reference procedurally generated meshes that this
module writes on demand.  Call `ensure_models()` before loading any scene
that references ../models/*.obj.
"""

from __future__ import annotations

import os

from tpupt.scene import procedural


def _gen_bunny():
    return procedural.bunny_substitute()  # 5120 tris, bunny-scale


def _gen_ajax():
    # "bust"-scale stand-in at REFERENCE SCALE (r3 verdict #3/#6: the
    # real ajax.obj is a high-poly scan; the old 5k-tri substitute kept
    # the scene but not the scale): 81,920 triangles — a subdiv-6
    # icosphere with multi-frequency displacement so the BVH/treelet
    # hierarchy gets scan-like structure.  RAW coordinates match the real
    # ajax.obj the reference scene was tuned for: ajax-white.json bakes
    # translate(+17.28 z) + scale 0.2 with the camera looking at
    # (0, 3.5, 0), which implies the scan is centered near raw
    # (0.05, 17.5, -17.28) and ~28 units tall.
    import numpy as np

    v, f = procedural.icosphere(6, 1.0)
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    bump = (
        1.0
        + 0.18 * np.sin(6 * x) * np.sin(5 * z)
        + 0.1 * np.cos(7 * y)
        + 0.04 * np.sin(23 * x + 11 * y)
        + 0.02 * np.cos(41 * z - 17 * x)
    )
    v = v * bump[:, None]
    v[:, 0] = v[:, 0] * 4.5 + 0.053126335
    v[:, 1] = v[:, 1] * 14.0 + 17.469807
    v[:, 2] = v[:, 2] * 4.5 - 17.283958
    return v.astype(np.float32), f


def _gen_ajax_hi():
    # The reference's REAL ajax.obj is a several-hundred-thousand-tri
    # scan (model_loader.cpp:11-44 loads it via Assimp); the 82k stand-in
    # above proves the scene, this one proves the ACCELERATOR at that
    # scale: subdiv-7 → 327,680 triangles, K ~ 1.5e4 treelets — the
    # regime where O(K) per-step selection dominates and the super-pq
    # selection (accel/packets._SUPER_SEL_MIN_K) must carry the sweep.
    import numpy as np

    v, f = procedural.icosphere(7, 1.0)
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    bump = (
        1.0
        + 0.18 * np.sin(6 * x) * np.sin(5 * z)
        + 0.1 * np.cos(7 * y)
        + 0.04 * np.sin(23 * x + 11 * y)
        + 0.02 * np.cos(41 * z - 17 * x)
    )
    v = v * bump[:, None]
    v[:, 0] = v[:, 0] * 4.5 + 0.053126335
    v[:, 1] = v[:, 1] * 14.0 + 17.469807
    v[:, 2] = v[:, 2] * 4.5 - 17.283958
    return v.astype(np.float32), f


def _gen_blob():
    import numpy as np

    v, f = procedural.icosphere(3, 0.5)
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    v = v * (1.0 + 0.2 * np.sin(5 * x + 2 * y) * np.cos(4 * z))[:, None]
    return v.astype(np.float32), f


def _gen_knot():
    return procedural.torus_knot(radius=0.9, tube=0.16)


def _gen_quad():
    """Unit quad in the XZ plane centered at the origin (2 triangles) —
    the canonical area-light panel for cornell_area.json."""
    import numpy as np

    v = np.array(
        [[-0.5, 0.0, -0.5], [0.5, 0.0, -0.5], [0.5, 0.0, 0.5],
         [-0.5, 0.0, 0.5]], np.float32,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return v, f


# name -> (generator, version).  Bump the version when a generator's
# output changes: ensure_models tags the file's first comment line and
# regenerates on mismatch (the .obj files are gitignored build products).
_GENERATORS = {
    "bunny.obj": (_gen_bunny, 1),
    "ajax.obj": (_gen_ajax, 2),
    "ajax_hi.obj": (_gen_ajax_hi, 1),
    "blob.obj": (_gen_blob, 1),
    "knot.obj": (_gen_knot, 1),
    "quad.obj": (_gen_quad, 1),
}


def default_models_dir() -> str:
    return os.path.join(locate_asset_path(), "models")


def locate_asset_path(start: str | None = None) -> str:
    """Walk up from CWD looking for an assets/ dir (reference
    locate_asset_path, src/lib/assets/assets.cpp:6-23), falling back to the
    repo's own assets directory."""
    d = os.path.abspath(start or os.getcwd())
    while True:
        cand = os.path.join(d, "assets")
        if os.path.isdir(cand):
            return cand
        parent = os.path.dirname(d)
        if parent == d:
            break
        d = parent
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "assets")


def ensure_models(models_dir: str | None = None) -> str:
    """Write any missing or version-stale generated .obj models; returns
    the models dir."""
    models_dir = models_dir or default_models_dir()
    os.makedirs(models_dir, exist_ok=True)
    for name, (gen, version) in _GENERATORS.items():
        path = os.path.join(models_dir, name)
        tag = f"tpupt-gen {name} v{version}"
        if os.path.exists(path):
            with open(path) as fh:
                first = fh.readline().strip()
            if first == f"# {tag}":
                continue
        v, f = gen()
        procedural.write_obj(path, v, f, header=tag)
    return models_dir
