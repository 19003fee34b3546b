"""Multi-light enclosing-emitter estimator tests (VERDICT r4 item 7).

A shading point INSIDE an emissive sphere (a dome/sky light) is
unreachable by any shadow ray, so NEE can never estimate that light: its
BSDF-path emission must survive the post-diffuse suppression on EVERY
draw. The round-4 gate keyed the exemption on whether NEE happened to
SAMPLE the containing light, which with n lights (a) under-counted the
dome by the pick probability — draws that sampled another light
suppressed the dome's only estimator — and (b) over-counted interior
lights: the unsuppressed draws double-added their BSDF emission on top of
the shadow-ray estimate. The round-5 gate suppresses unconditionally and
exempts hits FROM INSIDE the emitter at emission time (lax: outward
normal along the ray; kernels: |o-c|^2 (1/r)^2 < 1 on the best-hit
planes), which fires on every draw and is exact.

The unbiased oracle is nee=False with the SAME cosine diffuse sampler:
plain BSDF path tracing has no suppression at all, so it is exact for any
light configuration. (The reference has no NEE at all — its estimator
only finds lights by chance, cpp_raytracer/raytracer_core.cpp:306-312 —
so this corner is beyond-reference surface; parity is against the
unbiased transport, not against reference output.)

Measured old-gate bias (lax, K=12 frames x 48 spp, 48x36, depth 4,
recorded 2026-08-21 immediately before the fix, same seeds as the tests
below): dome+interior image mean 0.4193 under NEE vs 0.5005 unbiased
(-16.2%, -128 sigma — the dome's only estimator was suppressed on the
half of draws that sampled the interior light); dim-dome variant 0.0397
vs 0.0266 (+49%, +21 sigma — the interior light double-counted on the
unsuppressed draws); single-dome control +2.3 sigma (already exact, as
designed). The new gate lands within the noise bound on all three (this
file's tests re-verify that on every run).
"""

import jax
import numpy as np
import pytest

from tpu_rt.core.types import make_camera, make_scene
from tpu_rt.render.frame import render

W, H, DEPTH = 48, 36, 4

_tpu = [d for d in jax.devices() if "TPU" in str(d)]


@pytest.fixture(params=(["tpu"] if _tpu else ["interpret"]))
def tpu_or_interpret(request):
    if request.param == "tpu":
        with jax.default_device(_tpu[0]):
            yield (True, False)
    else:
        yield (False, True)


def dome_scene(interior_light=True):
    """Ground + diffuse ball enclosed by an emissive absorbing dome, plus
    an optional small bright interior light: every diffuse shading point
    sits INSIDE the dome, and with the interior light present the NEE
    light pick is 2-way — the configuration the old gate got wrong."""
    centers = [(0.0, -100.5, -3.0), (0.0, 0.2, -3.0), (0.0, 0.0, -3.0)]
    radii = [100.0, 0.7, 60.0]
    albedos = [(0.6, 0.6, 0.6), (0.7, 0.3, 0.3), (0.0, 0.0, 0.0)]
    metallics = [0.0, 0.0, 0.0]
    roughnesses = [0.5, 0.5, 1.0]
    emissions = [(0, 0, 0), (0, 0, 0), (0.5, 0.6, 0.8)]
    if interior_light:
        centers.append((-1.0, 2.5, -2.5))
        radii.append(0.35)
        albedos.append((1.0, 1.0, 1.0))
        metallics.append(0.0)
        roughnesses.append(0.0)
        emissions.append((14.0, 12.0, 10.0))
    return make_scene(centers, radii, albedos, metallics, roughnesses,
                      emissions, background=(0.0, 0.0, 0.0))


CAM = dict(position=(0, 1.0, 2.0), target=(0, 0.2, -3))


def lax_frames(scene, n_frames, seed0, spp, **kw):
    cam = make_camera(aspect=W / H, **CAM)
    return np.stack([
        np.asarray(render(scene, cam, jax.random.key(seed0 + k), width=W,
                          height=H, spp=spp, max_depth=DEPTH, gamma=False,
                          engine="lax", **kw))
        for k in range(n_frames)])


def mean_gap_ok(a_frames, b_frames, n_sigma=3.0):
    """Whole-image-mean comparison with the empirical seed-to-seed SE:
    the discriminating statistic for a uniform-ish bias (a per-pixel RMSE
    would bury a few-percent global shift under per-pixel noise)."""
    ma = a_frames.reshape(a_frames.shape[0], -1).mean(1)
    mb = b_frames.reshape(b_frames.shape[0], -1).mean(1)
    gap = abs(ma.mean() - mb.mean())
    se = float(np.sqrt(ma.var() / len(ma) + mb.var() / len(mb)))
    return gap, se, gap <= n_sigma * se


def test_dome_plus_interior_nee_unbiased():
    """THE quantifying test: dome + interior light, NEE mean vs the
    unbiased cosine path tracer's mean. The old gate failed this at -128
    sigma (-16.2% image mean); the exact gate agrees within noise."""
    scene = dome_scene(interior_light=True)
    K, spp = 12, 48
    nee = lax_frames(scene, K, 100, spp, nee=True)
    ub = lax_frames(scene, K, 900, spp, diffuse_sampling="cosine")
    gap, se, ok = mean_gap_ok(nee, ub)
    assert ok, (gap, se, nee.mean(), ub.mean())


def test_single_dome_nee_unchanged():
    """With ONE enclosing light the old gate was already exact; the new
    gate must stay exact (regression guard for the rewrite)."""
    scene = dome_scene(interior_light=False)
    K, spp = 10, 32
    nee = lax_frames(scene, K, 200, spp, nee=True)
    ub = lax_frames(scene, K, 950, spp, diffuse_sampling="cosine")
    gap, se, ok = mean_gap_ok(nee, ub)
    assert ok, (gap, se, nee.mean(), ub.mean())


def test_interior_light_not_overcounted():
    """Sharper bound on bias (b): with the dome's OWN emission dimmed to
    near-black, the image is dominated by the interior light; the old
    gate's unsuppressed draws double-counted it (+49%, +21 sigma). The
    new gate must match the unbiased estimator."""
    scene = dome_scene(interior_light=True)
    # dim the dome: keep it emissive (stays in the light cdf and keeps
    # the 2-way pick) but contribute ~nothing, isolating the interior
    # light's double-count
    em = np.asarray(scene.emission).copy()
    em[2] = (1e-3, 1e-3, 1e-3)
    scene = scene._replace(emission=jax.numpy.asarray(em))
    K, spp = 12, 48
    nee = lax_frames(scene, K, 300, spp, nee=True)
    ub = lax_frames(scene, K, 990, spp, diffuse_sampling="cosine")
    gap, se, ok = mean_gap_ok(nee, ub)
    assert ok, (gap, se, nee.mean(), ub.mean())


def test_megakernel_matches_lax_on_multilight(tpu_or_interpret):
    """The megakernel's inside-hit gate implements the same exact
    estimator: its NEE mean agrees with the lax NEE mean on the
    dome+interior scene."""
    on_tpu, interpret = tpu_or_interpret
    from tpu_rt.ops.pallas_megakernel import render_pallas

    scene = dome_scene(interior_light=True)
    K, spp = (8, 16) if interpret else (16, 48)
    cam = make_camera(aspect=W / H, **CAM)
    mk = np.stack([
        np.asarray(render_pallas(scene, cam, 40 + k * (1 << 16), width=W,
                                 height=H, spp=spp, max_depth=DEPTH,
                                 n_active=scene.capacity, nee=True,
                                 gamma=False, interpret=interpret))
        for k in range(K)])
    lx = lax_frames(scene, K, 400, spp, nee=True)
    gap, se, ok = mean_gap_ok(mk, lx)
    assert ok, (gap, se, mk.mean(), lx.mean())


def test_cluster_matches_lax_on_multilight(tpu_or_interpret):
    """Same exactness bound for the cluster engine's fused NEE. The
    whole-image-mean statistic here is sharp enough (SE ~2e-4) to resolve
    the cluster engine's DOCUMENTED bf16 attribute packing
    (pallas_cluster._pack_bf16_pair: bf16(0.6) = +0.26%, bf16(0.8) =
    +0.10% — measured +4.8 sigma against the f32 lax render of this
    dome-dominated scene), so the lax oracle renders the bf16-rounded
    scene: both sides then see the same effective materials and the
    comparison isolates the ESTIMATOR."""
    on_tpu, interpret = tpu_or_interpret
    import jax.numpy as jnp

    from tpu_rt.ops.pallas_cluster import render_cluster

    scene = dome_scene(interior_light=True)
    K, spp = (8, 16) if interpret else (16, 48)
    cam = make_camera(aspect=W / H, **CAM)
    cl = np.stack([
        np.asarray(render_cluster(scene, cam, 50 + k * (1 << 16), width=W,
                                  height=H, spp=spp, max_depth=DEPTH,
                                  n_active=scene.capacity, nee=True,
                                  gamma=False, interpret=interpret))
        for k in range(K)])

    def bf16(x):
        return x.astype(jnp.bfloat16).astype(jnp.float32)  # RNE, as packed

    qscene = scene._replace(albedo=bf16(scene.albedo),
                            metallic=bf16(scene.metallic),
                            roughness=bf16(scene.roughness),
                            emission=bf16(scene.emission),
                            ior=bf16(scene.ior))
    lx = lax_frames(qscene, K, 500, spp, nee=True)
    gap, se, ok = mean_gap_ok(cl, lx)
    assert ok, (gap, se, cl.mean(), lx.mean())
