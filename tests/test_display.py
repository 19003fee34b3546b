"""Fused on-device display pipeline (render/display.py): row semantics,
single-implementation guarantees vs render/frame.py helpers, and the app
layer's per-frame error isolation (a failing denoiser stage must not
freeze the GUI — reference keeps per-method try/except, denoiser.py via
interaction.py:1366-1383)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_rt.ops import post
from tpu_rt.render import frame as F
from tpu_rt.render.display import DISPLAY, ENHANCED, display_stack


@pytest.fixture
def acc(rng_np):
    return rng_np.uniform(0.0, 1.4, (24, 32, 3)).astype(np.float32)


def test_stack_rows_match_frame_helpers(acc):
    methods = ("gaussian", "median")
    stack = np.asarray(display_stack(acc, 1.0, methods=methods))
    assert stack.shape == (2 + len(methods), 24, 32, 3)
    disp = np.asarray(F.tone_map(jnp.asarray(acc), 1.0))
    np.testing.assert_allclose(stack[DISPLAY], disp, atol=1e-6)
    np.testing.assert_allclose(
        stack[ENHANCED], np.asarray(F.enhance_contrast(jnp.asarray(disp))),
        atol=1e-6)
    np.testing.assert_allclose(
        stack[2], np.asarray(post.gaussian_blur(disp, ksize=5, sigma=1.0)),
        atol=1e-5)
    np.testing.assert_allclose(
        stack[3], np.asarray(post.median_blur(disp, ksize=5)), atol=1e-5)


def test_stack_linear_mode_applies_gamma_first(acc):
    lin = np.asarray(display_stack(acc, 1.0, linear=True))
    gam = np.clip(np.sqrt(np.maximum(acc, 0.0)), 0.0, 1.0)
    np.testing.assert_allclose(
        lin[DISPLAY], np.asarray(F.tone_map(jnp.asarray(gam), 1.0)),
        atol=1e-6)


def test_stack_no_enhance_duplicates_display(acc):
    stack = np.asarray(display_stack(acc, 2.0, enhance=False))
    np.testing.assert_array_equal(stack[DISPLAY], stack[ENHANCED])


def test_stack_unknown_method_raises(acc):
    with pytest.raises(ValueError, match="unknown stackable denoiser"):
        display_stack(acc, 1.0, methods=("nope",))


def test_stack_uint8_quantizes_on_device(acc):
    """as_uint8=True returns the same stack quantized to uint8 (the wire
    format for the interactive display pull — 4x less tunnel traffic)."""
    f32 = np.asarray(display_stack(acc, 1.3, methods=("gaussian",)))
    u8 = np.asarray(display_stack(acc, 1.3, methods=("gaussian",),
                                  as_uint8=True))
    assert u8.dtype == np.uint8 and u8.shape == f32.shape
    np.testing.assert_array_equal(
        u8, np.round(np.clip(f32, 0.0, 1.0) * 255).astype(np.uint8))


def test_display_error_isolation_still_ships_frame(monkeypatch):
    """A denoiser stage blowing up mid-session must degrade to the plain
    tone-mapped frame, not silently drop every subsequent frame."""
    from tpu_rt.app.interaction import RayTracerInteraction
    from tpu_rt.render import display as D

    r = RayTracerInteraction(32, 24)
    try:
        r.settings["show_denoisers"] = True
        r.settings["selected_denoisers"] = ["gaussian"]
        r._acc_dev = jnp.zeros((24, 32, 3), jnp.float32) + 0.25

        real = D.display_stack

        def flaky(acc, exposure, *, methods=(), **kw):
            if methods:
                raise RuntimeError("backend lowering failed")
            return real(acc, exposure, methods=methods, **kw)

        monkeypatch.setattr(D, "display_stack", flaky)
        r._process_frame_for_display(0.01, batch_start=0.0)
        f = r.get_frame()
        assert f is not None and f["mode"] == "raytracing"
        assert f["display"].shape == (24, 32, 3)
        assert f["denoised"] == {}  # failing stages dropped, frame shipped
        assert f["frame_latency"] is not None
    finally:
        # the constructor spawns the tpu_rt-camera worker; the autouse
        # leak fixture (conftest.py) errors any test that leaves it alive
        r.stop_rendering()


def test_grid_scale_quad_packing(acc):
    """grid_scale=2: denoisers run on the 2x-downsampled display image and
    tile into ONE quad row; unpack_grid inverts the packing exactly and
    each tile equals the method applied to the downsampled image."""
    from tpu_rt.render.display import unpack_grid, _apply_method

    methods = ("bilateral", "nlmeans", "gaussian", "median")
    stack = np.asarray(display_stack(acc, 1.0, methods=methods,
                                     grid_scale=2))
    assert stack.shape == (3, 24, 32, 3)  # display, enhanced, quad
    disp = F.tone_map(jnp.asarray(acc), 1.0)
    small = np.asarray(disp).reshape(12, 2, 16, 2, 3).mean(axis=(1, 3))
    tiles = unpack_grid(stack[2], methods, 2)
    for m in methods:
        want = np.asarray(_apply_method(m, jnp.asarray(small)))
        np.testing.assert_allclose(tiles[m], want, atol=1e-5)
    # rows 0/1 stay full-resolution and unchanged by the packing
    base = np.asarray(display_stack(acc, 1.0, methods=()))
    np.testing.assert_allclose(stack[:2], base, atol=1e-6)


def test_grid_scale_flows_through_interaction(monkeypatch):
    """The app's dispatch/finish pair round-trips the packed stack: the
    frame dict's denoised images come back per-method at half size."""
    from tpu_rt.app.interaction import RayTracerInteraction

    rt = RayTracerInteraction(64, 48)
    try:
        rt.settings["show_denoisers"] = True
        rt.settings["selected_denoisers"] = ["gaussian", "median"]
        import jax.numpy as jnp

        rt._acc_dev = jnp.ones((48, 64, 3), jnp.float32) * 0.5
        dispatched = rt._dispatch_display_stack()
        assert dispatched is not None
        stack_dev, methods, gscale = dispatched
        assert gscale == 2 and methods == ("gaussian", "median")
        assert stack_dev.shape == (3, 48, 64, 3)
        rt._finish_display_frame(dispatched, 0.01, batch_start=None)
        f = rt.get_frame()
        assert f is not None
        assert set(f["denoised"]) == {"gaussian", "median"}
        assert f["denoised"]["gaussian"].shape == (24, 32, 3)
        assert f["display"].shape == (48, 64, 3)
    finally:
        rt.stop_rendering()
