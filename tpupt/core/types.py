"""Core pytree types.

The reference represents scene state as C++ structs with tagged unions and
device buffers (src/lib/scene.hpp:14-67, src/lib/material.hpp:19-38).  The
TPU-native design is structure-of-arrays: every scene entity is a flat,
statically shaped `jnp` array inside a single `SceneArrays` pytree so the
whole render step jits once and the compiler sees only dense vector ops.

All float arrays are float32 (path-tracing geometry needs the precision; the
VPU runs fp32 natively).  Integer ids are int32.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

# Object type tags (reference: ObjectType in src/lib/scene.hpp:14).
OBJ_SPHERE = 0
OBJ_MESH = 1

# Material type tags (reference: Material::Type in src/lib/material.hpp:20).
MAT_DIFFUSE = 0
MAT_METAL = 1
MAT_DIELECTRIC = 2
# Extension: emissive area lights (the reference's only light is the sky
# background; a closed Cornell box needs a lamp).
MAT_EMISSIVE = 3

# Primitive-kind tags used in hit records.
PRIM_NONE = -1
PRIM_SPHERE = 0
PRIM_TRIANGLE = 1


@struct.dataclass
class Camera:
    """Pinhole camera (reference: src/lib/camera.hpp:10-23).

    ``camera_matrix`` is the camera-to-world transform (translate · rotation,
    reference src/lib/camera.cpp:5-13).  ``vfov`` is in radians.
    """

    camera_matrix: jnp.ndarray  # (4, 4) f32
    vfov: jnp.ndarray  # () f32, radians
    # Width/height live outside jit as static python ints on the render call;
    # they are not part of the pytree.


@struct.dataclass
class Materials:
    """SoA of the 3 BSDF types (reference tagged union src/lib/material.hpp).

    Every material stores every field; ``mat_type`` selects which fields are
    live.  Dead fields are zero.  This trades a little memory for fully
    branch-free vectorized shading.
    """

    mat_type: jnp.ndarray  # (M,) i32 in {MAT_DIFFUSE, ..., MAT_EMISSIVE}
    albedo: jnp.ndarray  # (M, 3) f32 — diffuse / metal albedo
    fuzz: jnp.ndarray  # (M,) f32 — metal fuzz
    ior: jnp.ndarray  # (M,) f32 — dielectric refraction index
    emission: jnp.ndarray  # (M, 3) f32 — emissive radiance (lights)


@struct.dataclass
class SceneArrays:
    """The entire scene as one device-resident pytree.

    Replaces the reference `Aggregate` (src/lib/scene.hpp:25-40).  Unlike the
    reference — which uploads only the *first* mesh and shares it between all
    mesh objects (src/lib/scene_description.cpp:95) — geometry of all meshes
    is concatenated into one vertex/triangle/BVH pool with per-mesh ranges,
    so multi-mesh scenes work from day one (SURVEY.md §2.1 #23 quirk).

    Differentiable leaves: ``sphere_center``, ``sphere_radius``,
    ``positions`` (mesh vertices), everything in ``materials``, and the
    background colors ``bg_down`` / ``bg_up``.  Integer arrays get zero
    cotangents automatically.

    Object *kinds* and per-mesh BVH roots are static Python tuples
    (``pytree_node=False``): the integrator unrolls a tiny loop over scene
    objects at trace time, dispatching sphere vs. mesh statically — the TPU
    equivalent of the reference's device-side `switch (obj.type)`
    (src/lib/path_tracer.cu:86-105) without branching vector lanes.
    """

    # Per-object tables (reference GPUObject, src/lib/scene.hpp:16-22).
    obj_mat: jnp.ndarray  # (O,) i32 — material index
    obj_m: jnp.ndarray  # (O, 4, 4) f32 — object-to-world
    obj_inv_m: jnp.ndarray  # (O, 4, 4) f32 — world-to-object (cached inverse)
    obj_aabb_min: jnp.ndarray  # (O, 3) f32 — world-space AABB
    obj_aabb_max: jnp.ndarray  # (O, 3) f32

    # Sphere pool (reference src/lib/sphere.hpp).
    sphere_center: jnp.ndarray  # (S, 3) f32
    sphere_radius: jnp.ndarray  # (S,) f32

    # Mesh pool: concatenated across meshes.
    positions: jnp.ndarray  # (V, 3) f32
    tri_idx: jnp.ndarray  # (T, 3) i32 — global vertex indices

    # Flattened BVHs, concatenated across meshes; depth-first order with skip
    # links (our layout; the reference flattens breadth-first with
    # right = left + 1, src/lib/accelerators/bvh.cpp:211-253 — DFS+skip makes
    # the traversal stackless which is what lockstep vector lanes want).
    # Used by the per-ray reference traversal (accel/traverse.py).
    node_min: jnp.ndarray  # (B, 3) f32 — object-space AABB
    node_max: jnp.ndarray  # (B, 3) f32
    node_tri: jnp.ndarray  # (B,) i32 — global triangle id (leaf), else -1
    node_skip: jnp.ndarray  # (B,) i32 — absolute next-node-if-skip, -1 = done

    # World-space treelet table — the PRODUCTION accelerator on TPU
    # (accel/treelets.py): packed per-instance world-space triangle blocks
    # swept by ray packets with dense vector math.
    tre_min: jnp.ndarray  # (K, 3) f32 world AABB per treelet
    tre_max: jnp.ndarray  # (K, 3) f32
    # Packed blocks [p0, e1, e2, cn, obj] x L (component-major;
    # accel/treelets.BLOCK_COMPONENTS).  cn = unnormalized f32
    # cross(e1,e2) and the object id ride WITH the geometry so the sweep
    # selects the winner's normal/object IN-REGISTER — per-lane metadata
    # gathers serialize on TPU and their (N, small)-minor results poison
    # downstream layouts (DESIGN.md round-2 profile: 33% of a render).
    tre_tris: jnp.ndarray  # (K, L*BLOCK_COMPONENTS) f32
    slot_src: jnp.ndarray  # (K*L,) i32 — original global tri id, -1 pad
    slot_obj: jnp.ndarray  # (K*L,) i32 — owning object id, -1 pad

    materials: Materials

    # Background "light": lerp(bg_down → bg_up) over ray dir.y (reference
    # get_background_color, src/lib/path_tracer.cu:29-34, hardcoded
    # (0.5,0.7,1.0)→(1,1,1); here a differentiable parameter).
    bg_down: jnp.ndarray  # (3,) f32
    bg_up: jnp.ndarray  # (3,) f32

    # Emissive-sphere light list for next-event estimation (world-space
    # GEOMETRY only, baked at build; empty-safe placeholder row when no
    # lights).  Emission radiance is NOT duplicated here: NEE reads it
    # from ``materials.emission`` through ``s_light_mats`` so a single
    # differentiable parameter feeds both the direct-hit and the NEE
    # estimator terms (a baked copy silently froze the NEE half of the
    # emission gradient — round-2 verdict Weak #2).
    nee_center: jnp.ndarray  # (Ls, 3) f32
    nee_radius: jnp.ndarray  # (Ls,) f32

    # Triangle-area lights: world-baked triangles of emissive MESH
    # instances, sampled by NEE area-proportionally (spheres alone would
    # leave emissive meshes BSDF-only — and, with NEE active, their
    # emission gated off after diffuse bounces: lost light).
    # Packed rows [p0(3), e1(3), e2(3), obj, mat]; placeholder row when
    # none (s_tri_light_count gates statically).
    tri_light_pack: jnp.ndarray  # (Lt, 11) f32
    tri_light_cum: jnp.ndarray  # (Lt,) f32 — normalized cumulative area
    tri_light_area: jnp.ndarray  # () f32 — total area (world units)

    # --- static (non-pytree) scene structure ---------------------------
    # kind per object: OBJ_SPHERE or OBJ_MESH
    s_obj_kind: tuple = struct.field(pytree_node=False, default=())
    # primitive id per object: sphere pool index or mesh id
    s_obj_prim: tuple = struct.field(pytree_node=False, default=())
    # absolute BVH root node index per mesh
    s_mesh_root: tuple = struct.field(pytree_node=False, default=())
    # global triangle range (lo, hi) per mesh
    s_mesh_tri_range: tuple = struct.field(pytree_node=False, default=())
    # treelet leaf size L (static: shapes depend on it)
    s_leaf_size: int = struct.field(pytree_node=False, default=64)
    # object ids of emissive spheres (NEE light list; static)
    s_light_objs: tuple = struct.field(pytree_node=False, default=())
    # material index per NEE light (static): the emission read goes
    # through materials.emission so light gradients flow end-to-end
    s_light_mats: tuple = struct.field(pytree_node=False, default=())
    # number of emissive-mesh light triangles (static; 0 = no such lights)
    s_tri_light_count: int = struct.field(pytree_node=False, default=0)

    @property
    def num_objects(self) -> int:
        return len(self.s_obj_kind)

    @property
    def num_materials(self) -> int:
        return int(self.materials.mat_type.shape[0])


@struct.dataclass
class Hit:
    """Differentiable hit record (reference Intersection,
    src/lib/intersection.hpp:8-14), vectorized over a flat ray batch.
    point/normal are component-SoA Vec3 (core/vec.py)."""

    mask: jnp.ndarray  # (N,) bool — did the ray hit anything
    t: jnp.ndarray  # (N,) f32 — world-space hit distance
    point: Any  # Vec3 of (N,)
    normal: Any  # Vec3 of (N,) — faces against the incident ray
    front: jnp.ndarray  # (N,) bool — HitFaceSide::front
    mat_id: jnp.ndarray  # (N,) i32


@struct.dataclass
class HitIds:
    """Discrete (non-differentiable) intersection result: which primitive won.

    Produced by the stackless traversal under `stop_gradient`; consumed by
    `refine_hit` which recomputes the differentiable quantities in closed
    form for the winning primitive only.
    """

    kind: jnp.ndarray  # (N,) i32 in {PRIM_NONE, PRIM_SPHERE, PRIM_TRIANGLE}
    obj_id: jnp.ndarray  # (N,) i32 — winning object, -1 on miss
    prim_id: jnp.ndarray  # (N,) i32 — sphere pool index or global triangle id
    t: jnp.ndarray  # (N,) f32 — non-diff t (for statistics; refine recomputes)


@struct.dataclass
class RenderBuffers:
    """Progressive accumulation targets (reference PathTracer buffers,
    src/lib/path_tracer.hpp:73-80).  Flat, row-major y*W + x
    (reference flattern_index, src/lib/cuda_utils/indices.cuh:20-26)."""

    color: jnp.ndarray  # (N, 3) f32 — running average radiance
    normal: jnp.ndarray  # (N, 3) f32 — first-hit normal G-buffer
    depth: jnp.ndarray  # (N,) f32 — first-hit t G-buffer
    iteration: jnp.ndarray  # () i32 — samples accumulated so far

    @classmethod
    def create(cls, n_pixels: int) -> "RenderBuffers":
        return cls(
            color=jnp.zeros((n_pixels, 3), jnp.float32),
            normal=jnp.zeros((n_pixels, 3), jnp.float32),
            depth=jnp.zeros((n_pixels,), jnp.float32),
            iteration=jnp.zeros((), jnp.int32),
        )


def tree_summary(tree: Any) -> str:
    """Debug helper: one-line shape/dtype summary of a pytree."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    return ", ".join(f"{getattr(l, 'shape', ())}:{getattr(l, 'dtype', type(l).__name__)}" for l in leaves)
