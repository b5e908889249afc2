"""Interactive viewer state machine (pipeline/interactive.py): orbit,
zoom, motion-adaptive quality — testable without a display."""
import numpy as np

from gsdf_tpu import Builder
from gsdf_tpu.pipeline import InteractiveViewer


def _viewer():
    bld = Builder()
    obj = bld.smooth_union(0.1, bld.new_sphere(0.7), bld.new_box(1, 1, 0.4, 0))
    return InteractiveViewer(obj, width=64, height=64, steps=48, drag_steps=16)


def test_orbit_and_zoom_change_view():
    v = _viewer()
    img0 = v.render_current("full")
    assert img0.shape == (64, 64, 3) and img0.dtype == np.uint8
    v.on_press(10, 10)
    assert v.on_move(30, 18)  # drag -> view changed
    v.on_release()
    img1 = v.render_current("full")
    assert not np.array_equal(img0, img1)
    yaw_before = v.yaw
    assert v.on_scroll(2)
    assert v.cam_dist < 2.4 and v.yaw == yaw_before


def test_drag_quality_is_cheap_but_full_size():
    v = _viewer()
    img = v.render_current("drag")
    # half-res render, upscaled to the window size
    assert img.shape == (64, 64, 3)


def test_rest_quality_defaults_reference_parity():
    """Rest frames default to aa=3 supersampling — the reference UI's
    AA-at-rest (gsdfaux/ui.go:131-241); drag frames always dispatch
    aa=1 at half resolution (motion-adaptive downshift). The aa*W x
    aa*H frame is box-filtered ON DEVICE, so the fetched image is the
    window size for any aa."""
    v = _viewer()
    assert v.aa == 3
    img = v.render_current("full")
    assert img.shape == (64, 64, 3)
    # aa=1 viewer produces the same geometry but visibly different
    # edge pixels (the supersample filter is real, not a no-op)
    bld = Builder()
    obj = bld.smooth_union(0.1, bld.new_sphere(0.7), bld.new_box(1, 1, 0.4, 0))
    v1 = InteractiveViewer(obj, width=64, height=64, steps=48, aa=1)
    img1 = v1.render_current("full")
    assert not np.array_equal(img, img1)


def test_move_without_press_is_noop():
    v = _viewer()
    assert not v.on_move(5, 5)
    v.reset()
    assert (v.yaw, v.pitch, v.cam_dist) == (0.6, 0.5, 2.4)


def test_pitch_clamped():
    v = _viewer()
    v.on_press(0, 0)
    v.on_move(0, 10000)
    assert abs(v.pitch) <= 1.45


def test_auto_relax_detects_warped_trees():
    from gsdf_tpu.forge import threads
    from gsdf_tpu.visual.raymarch import auto_relax

    bld = Builder()
    plain = bld.union(bld.new_sphere(1.0), bld.new_box(1, 1, 1, 0))
    assert auto_relax(plain) == 0.8
    twisted = bld.twist(bld.new_box(1, 1, 1, 0), 0.5)
    assert auto_relax(twisted) == 0.6
    screw = threads.screw(bld, 4.0, threads.ISO(d=3.0, p=0.5))
    assert auto_relax(bld.union(plain, screw)) == 0.6


def _pump_mouse(canvas, name, x, y, button=1, step=0):
    """Dispatch a synthetic matplotlib event through the canvas callback
    registry — the same path a real window takes."""
    from matplotlib.backend_bases import KeyEvent, MouseEvent

    if name == "key_press_event":
        ev = KeyEvent(name, canvas, "r", x=x, y=y)
    else:
        ev = MouseEvent(name, canvas, x, y, button=button, step=step)
    canvas.callbacks.process(name, ev)


def test_show_wiring_event_pump(monkeypatch):
    """Drives show()'s actual figure wiring on the Agg canvas: synthetic
    press/move/release/scroll/key events must orbit the camera, render
    drag-quality frames while moving and full-quality at rest, and update
    the image artist — the last untested event-loop lines."""
    import matplotlib

    matplotlib.use("Agg", force=True)

    v = _viewer()
    fig = v._build_figure()
    canvas = fig.canvas
    assert v._frame_ms["full"]  # initial frame rendered at full quality
    n_full0, n_drag0 = len(v._frame_ms["full"]), len(v._frame_ms["drag"])
    img0 = np.asarray(v._im.get_array())
    yaw0 = v.yaw

    # press inside the axes (MouseEvent computes xdata from the layout)
    w, h = canvas.get_width_height()
    _pump_mouse(canvas, "button_press_event", w // 2, h // 2)
    assert v._dragging
    _pump_mouse(canvas, "motion_notify_event", w // 2 + 15, h // 2 + 5)
    assert v.yaw != yaw0  # orbit applied
    assert len(v._frame_ms["drag"]) == n_drag0 + 1  # motion = drag quality
    _pump_mouse(canvas, "button_release_event", w // 2 + 15, h // 2 + 5)
    assert not v._dragging
    assert len(v._frame_ms["full"]) == n_full0 + 1  # rest = full quality
    assert not np.array_equal(np.asarray(v._im.get_array()), img0)

    # scroll zooms and redraws drag + full
    d0 = v.cam_dist
    _pump_mouse(canvas, "scroll_event", w // 2, h // 2, step=2)
    assert v.cam_dist < d0
    # 'r' resets the view
    v.yaw = 9.9
    _pump_mouse(canvas, "key_press_event", w // 2, h // 2)
    assert v.yaw == 0.6

    stats = v.frame_stats()
    assert stats["full"]["frames"] >= 3 and stats["drag"]["frames"] >= 2
    assert stats["full"]["median_ms"] > 0 and stats["drag"]["fps"] > 0
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_pipelined_drag_frames_one_behind():
    """Drag pipelining (two in-flight device frames): the displayed
    frame is one event behind the view state; a rest (full) frame
    flushes the pipeline and reflects the exact current view."""
    bld = Builder()
    obj = bld.new_sphere(0.7)
    v = InteractiveViewer(
        obj, width=64, height=64, steps=48, drag_steps=16, pipeline=True
    )
    assert v.pipeline
    v.on_press(10, 10)
    v.on_move(20, 10)
    f1 = v.render_current("drag")  # dispatches view A, shows view A
    v.on_move(52, 10)
    f2 = v.render_current("drag")  # dispatches view B, shows view A
    np.testing.assert_array_equal(f1, f2)  # one behind
    v.on_move(60, 30)
    f3 = v.render_current("drag")  # shows view B
    assert not np.array_equal(f2, f3)
    v.on_release()
    full = v.render_current("full")  # flush: exact current view
    assert v._pending is None
    # unpipelined reference viewer at the same view agrees exactly
    v2 = InteractiveViewer(
        obj, width=64, height=64, steps=48, drag_steps=16, pipeline=False
    )
    v2.yaw, v2.pitch, v2.cam_dist = v.yaw, v.pitch, v.cam_dist
    np.testing.assert_array_equal(full, v2.render_current("full"))


def test_parametric_slider_edit_zero_recompile():
    """set_param (the slider callback) rebinds a continuous parameter
    and re-renders through the SAME per-structure executable — the
    raymarch cache must not grow across edits."""
    from gsdf_tpu.visual import raymarch as rm

    bld = Builder()
    boss = bld.new_cylinder(0.45, 1.2, 0.05)
    obj = bld.smooth_union(0.1, bld.new_box(1.6, 1.0, 0.5, 0.05), boss)
    v = InteractiveViewer(
        obj, width=64, height=64, steps=48, drag_steps=16,
        params=[("boss r", boss, "r", 0.2, 0.6)],
    )
    assert v.parametric
    img0 = v.render_current("full")
    n_exec = len(rm._rm_cache)
    for r in (0.3, 0.55, 0.4):
        v.set_param(boss, "r", r)
        img = v.render_current("full")
    assert len(rm._rm_cache) == n_exec, "slider edit compiled a new executable"
    assert not np.array_equal(img0, img)  # the edit is visible
    # drag frames run the parametric path too
    v.on_press(5, 5)
    v.on_move(25, 9)
    v.render_current("drag")
    v.render_current("drag")
    assert len(rm._rm_cache) == n_exec + 1  # one drag-shape executable


def test_set_param_requires_parametric_viewer():
    """set_param on a viewer constructed WITHOUT params must raise: each
    rebind would silently jit a fresh raymarch kernel per edit (and cache
    it forever) instead of the promised zero-recompile path."""
    import pytest

    bld = Builder()
    boss = bld.new_cylinder(0.45, 1.2, 0.05)
    obj = bld.smooth_union(0.1, bld.new_box(1.6, 1.0, 0.5, 0.05), boss)
    v = InteractiveViewer(obj, width=32, height=32, steps=16)
    assert not v.parametric
    with pytest.raises(ValueError, match="params"):
        v.set_param(boss, "r", 0.3)
