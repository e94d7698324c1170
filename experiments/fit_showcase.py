"""Inverse-rendering showcase (round-5 verdict #6): recover the Cornell
scene's materials AND lamp emission from a target render, committing
before/during/after images + a loss curve to images/.

The fit starts from a scene whose every diffuse albedo was flattened to
gray and whose lamp emits the wrong color at the wrong intensity, and
descends the MSE between its differentiable low-spp render and a clean
high-spp target — through the renderer only (no auxiliary losses, no
regularizers).  Gradients flow through NEE (emission is read live from
materials.emission — integrator._light_emission) and through every BSDF.

Reproduce:  python experiments/fit_showcase.py
Outputs:    images/fit_{target,before,during,after}.png,
            images/fit_loss.png, images/fit_showcase.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SIZE = 256
FIT_SPP = 2
FIT_MB = 4
STEPS = 1200
LR = 0.05
PREVIEW_SPP = 200  # forward (chained) renders for the committed images


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpupt.utils.cache import setup_compile_cache

    setup_compile_cache("bench")

    from tpupt.bench.harness import _scene_cornell
    from tpupt.diff.fit import fit_scene
    from tpupt.render.integrator import render_image
    from tpupt.utils.image import linear_to_gamma, to_uint8, write_image_file

    images = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "images")
    os.makedirs(images, exist_ok=True)

    scene, camera = _scene_cornell()

    def preview(s, path):
        buf, _ = jax.jit(
            lambda sc, c: render_image(sc, c, SIZE, SIZE, PREVIEW_SPP,
                                       max_bounces=16, rr_start=4)
        )(s, camera)
        img = to_uint8(linear_to_gamma(np.asarray(buf.color))).reshape(
            SIZE, SIZE, 3
        )
        write_image_file(path, img)
        return img

    t0 = time.time()
    # clean target from the TRUE scene (differentiable-path render so the
    # fit's loss floor is sampling noise, not estimator mismatch)
    tbuf, _ = jax.jit(
        lambda sc, c: render_image(sc, c, SIZE, SIZE, 64, max_bounces=FIT_MB,
                                   differentiable=True)
    )(scene, camera)
    target = tbuf.color
    preview(scene, os.path.join(images, "fit_target.png"))
    print(f"target rendered ({time.time()-t0:.0f}s)", file=sys.stderr)

    # the broken start: every lambertian gray, lamp wrong color + 4x dim
    mats = scene.materials
    albedo0 = np.asarray(mats.albedo).copy()
    lam = np.asarray(mats.mat_type) == 0  # MAT_DIFFUSE
    albedo0[lam] = 0.5
    emission0 = np.asarray(mats.emission).copy()
    emission0[emission0.sum(axis=1) > 0] = (1.0, 2.5, 4.0)
    wrong = scene.replace(materials=mats.replace(
        albedo=jnp.asarray(albedo0), emission=jnp.asarray(emission0)
    ))
    preview(wrong, os.path.join(images, "fit_before.png"))

    losses = []
    mid_scene = {}

    def cb(i, loss):
        losses.append(loss)
        if i % 20 == 0:
            print(f"step {i:4d}  loss {loss:.5f}  ({time.time()-t0:.0f}s)",
                  file=sys.stderr)

    # stage the fit so a mid-point image can be committed
    # the recovery story is albedo + emission; fuzz/ior stay frozen (an
    # unconstrained Adam step on ior can cross -1 and NaN Schlick)
    mf = ("albedo", "emission")
    fitted_mid, l1 = fit_scene(
        wrong, camera, target, SIZE, SIZE, steps=STEPS // 6,
        learning_rate=LR, spp=FIT_SPP, max_bounces=FIT_MB,
        material_filter=mf, callback=cb,
    )
    preview(fitted_mid, os.path.join(images, "fit_during.png"))
    fitted, l2 = fit_scene(
        fitted_mid, camera, target, SIZE, SIZE, steps=STEPS - STEPS // 6,
        learning_rate=LR, spp=FIT_SPP, max_bounces=FIT_MB,
        material_filter=mf, callback=cb,
    )
    losses = l1 + l2
    preview(fitted, os.path.join(images, "fit_after.png"))

    true_alb = np.asarray(scene.materials.albedo)
    got_alb = np.asarray(fitted.materials.albedo)
    true_em = np.asarray(scene.materials.emission)
    got_em = np.asarray(fitted.materials.emission)
    alb_err = float(np.abs(got_alb[lam] - true_alb[lam]).max())
    em_err = float(np.abs(got_em - true_em).max() / max(true_em.max(), 1e-9))
    summary = dict(
        steps=len(losses), loss_first=losses[0], loss_last=losses[-1],
        loss_ratio=losses[-1] / losses[0],
        albedo_maxerr=alb_err, emission_relerr=em_err,
        seconds=round(time.time() - t0, 1),
        config=dict(size=SIZE, fit_spp=FIT_SPP, mb=FIT_MB, lr=LR),
    )
    with open(os.path.join(images, "fit_showcase.json"), "w") as fh:
        json.dump(dict(summary=summary, losses=losses), fh)
    print(json.dumps(summary))

    # loss curve: single series -> line, log y, no legend (title names it)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=150)
    ax.plot(range(len(losses)), losses, color="#2563eb", linewidth=2)
    ax.set_yscale("log")
    ax.set_xlabel("Adam step", color="#374151")
    ax.set_ylabel("image MSE", color="#374151")
    ax.set_title(
        "Inverse rendering: Cornell materials + lamp emission recovery",
        color="#111827", fontsize=11,
    )
    ax.grid(True, color="#e5e7eb", linewidth=0.6)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#9ca3af")
    ax.tick_params(colors="#374151")
    ax.annotate(
        f"{losses[-1]:.4f}", (len(losses) - 1, losses[-1]),
        textcoords="offset points", xytext=(-4, 8), ha="right",
        color="#374151", fontsize=9,
    )
    fig.tight_layout()
    fig.savefig(os.path.join(images, "fit_loss.png"))
    print(f"wrote images/fit_*.png ({time.time()-t0:.0f}s total)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
