"""Headless GUI tests: painting core, labeller widgets (Agg), interactive GUI."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from ganecdotes_tpu.gui.labeller import (
    MaskPainter,
    OneShotLabellerGUI,
    sample_label_colors,
    visualize_label_mask,
)


def _images(n=2, size=32):
    rng = np.random.RandomState(0)
    return rng.rand(n, size, size, 3).astype(np.float32)


def test_mask_painter_polygon_and_undo():
    mp = MaskPainter(_images(), ["background", "a", "b"])
    assert mp.get_labels().shape == (2, 32, 32)

    mp.add_polygon([(2, 2), (2, 10), (10, 10), (10, 2)])
    labels = mp.get_labels()
    assert (labels[0] == 1).sum() > 0

    mp.next_class()
    assert mp._class == 2
    mp.add_polygon([(20, 20), (20, 28), (28, 28)])
    assert (mp.get_labels()[0] == 2).sum() > 0

    mp.undo()
    assert (mp.get_labels()[0] == 2).sum() == 0
    assert (mp.get_labels()[0] == 1).sum() > 0

    mp.reset()
    assert mp.get_labels().sum() == 0


def test_mask_painter_lasso_brush():
    mp = MaskPainter(_images(), ["background", "a"])
    mp.brush_up()
    mp.brush_up()
    assert mp.brush_size == 3
    mp.add_lasso([(5, 5), (25, 5), (25, 25)])
    assert (mp.get_labels()[0] == 1).sum() > 0
    mp.brush_down()
    assert mp.brush_size == 2


def test_overlay_and_visualization():
    mp = MaskPainter(_images(), ["background", "a"])
    mp.add_polygon([(0, 0), (0, 31), (31, 31), (31, 0)])
    overlay = mp.get_image_label_overlay()
    assert overlay.shape == (32, 32, 3)
    vis = visualize_label_mask(mp.get_labels()[0], sample_label_colors(2))
    assert vis.shape == (32, 32, 3)
    assert vis.sum() > 0


# -- synthesized-event helpers (drive the REAL matplotlib event pipeline
# on the Agg canvas: canvas.callbacks.process, not direct method calls) --


def _key(gui, k):
    from matplotlib.backend_bases import KeyEvent

    canvas = gui.fig.canvas
    canvas.callbacks.process(
        "key_press_event", KeyEvent("key_press_event", canvas, k)
    )


def _mouse(gui, name, x, y):
    from matplotlib.backend_bases import MouseEvent

    canvas = gui.fig.canvas
    canvas.callbacks.process(name, MouseEvent(name, canvas, x, y, button=1))


def _move_click(gui, xdata, ydata):
    """motion + press + release at data coords — what a real vertex click
    delivers (PolygonSelector tracks the cursor via motion events)."""
    x, y = gui.ax.transData.transform((xdata, ydata))
    _mouse(gui, "motion_notify_event", x, y)
    _mouse(gui, "button_press_event", x, y)
    _mouse(gui, "button_release_event", x, y)


def _drag(gui, pts):
    """press at pts[0], drag through the rest, release (lasso gesture)."""
    x, y = gui.ax.transData.transform(pts[0])
    _mouse(gui, "button_press_event", x, y)
    for p in pts[1:]:
        x, y = gui.ax.transData.transform(p)
        _mouse(gui, "motion_notify_event", x, y)
    _mouse(gui, "button_release_event", x, y)


def _click_button(gui, btn):
    """click inside a widgets.Button's axes through the event pipeline."""
    x, y = btn.ax.transAxes.transform((0.5, 0.5))
    _mouse(gui, "button_press_event", x, y)
    _mouse(gui, "button_release_event", x, y)


def test_labeller_gui_synthesized_events():
    """Drive the widget layer with real canvas events: key shortcuts via
    _key_maps, a lasso drag through LassoSelector -> _process_lasso, a
    polygon through PolygonSelector -> _process_polygon, and Undo via a
    real Button click (ref labeller.py's whole value is this event loop)."""
    gui = OneShotLabellerGUI(_images(), ["background", "a", "b"], block=False)
    gui.fig.canvas.draw()  # transforms must be valid before synthesizing

    # key shortcuts through the canvas (not direct _key_maps calls)
    _key(gui, "right")
    assert gui._class == 2
    _key(gui, "up")
    _key(gui, "up")
    assert gui.brush_size == 3
    _key(gui, "down")
    assert gui.brush_size == 2

    # 'c' arms the LassoSelector; a drag paints class 2 and disarms it
    _key(gui, "c")
    assert hasattr(gui, "lasso_selector")
    _drag(gui, [(2, 2), (2, 20), (20, 20), (20, 2)])
    n2 = (gui.get_labels()[0] == 2).sum()
    assert n2 > 0
    assert not hasattr(gui, "lasso_selector")  # one-shot: disarmed

    # 'v' arms the PolygonSelector; vertex clicks + closing click paint
    _key(gui, "left")  # back to class 1
    assert gui._class == 1
    _key(gui, "v")
    assert hasattr(gui, "poly_selector")
    verts = [(25, 25), (25, 30), (30, 30)]
    for v in verts:
        _move_click(gui, *v)
    _move_click(gui, *verts[0])  # clicking the first vertex completes
    assert (gui.get_labels()[0] == 1).sum() > 0
    assert not hasattr(gui, "poly_selector")

    # Undo via a real Button click removes the polygon, keeps the lasso
    _click_button(gui, gui.undo_btn)
    assert (gui.get_labels()[0] == 1).sum() == 0
    assert (gui.get_labels()[0] == 2).sum() == n2

    # 'z' keymap undoes the lasso too
    _key(gui, "z")
    assert gui.get_labels().sum() == 0


def test_labeller_gui_headless():
    gui = OneShotLabellerGUI(_images(), ["background", "a", "b"], block=False)
    gui._next_class(None)
    assert gui._class == 2
    gui._process_polygon([(2, 2), (2, 10), (10, 10)])
    assert (gui.get_labels()[0] == 2).sum() > 0
    gui._overlay(None)
    gui._next_img(None)
    assert gui.img_idx == 1
    gui._key_maps(type("E", (), {"key": "z"})())  # undo via keymap


@pytest.mark.slow
def test_interactive_gui_with_tiny_pipeline(tmp_path):
    import textwrap

    from ganecdotes_tpu.gui.interactive_labeller import InteractiveLabellerGUI
    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    from tests.test_pipeline import TINY_MODEL, TINY_SWAV, TINY_TRAINER

    cfgs = {}
    for name, body in [("model", TINY_MODEL), ("trainer", TINY_TRAINER),
                       ("swav", TINY_SWAV)]:
        p = tmp_path / f"{name}_config.py"
        p.write_text(textwrap.dedent(body))
        cfgs[name] = str(p)

    pipe = OneShotPipeline(
        out_dir=str(tmp_path / "out"), model="ffhq-256",
        segmentor="hfc_with_swav", num_test_samples=8,
        custom={"model": cfgs["model"], "trainer": cfgs["trainer"],
                "seg": cfgs["swav"]},
    )
    pipe.run_pipeline(blocks_to_run=("setup",))

    gui = InteractiveLabellerGUI(one_shot_learner=pipe, block=False)
    assert gui.out_grid.shape[-1] == 3
    gui.fig.canvas.draw()

    # Regenerate via its real button: fresh latents, new (unlabelled) grid
    old_latents = gui.out_latents.copy()
    _click_button(gui, gui.regenerate_btn)
    assert not np.allclose(gui.out_latents, old_latents)

    # paint -> train -> refresh round trip (ref interactive_labeller
    # :367-388), all through the canvas event pipeline: arm the polygon
    # tool, click a triangle onto the one-shot canvas, then click
    # Update/Train and assert the head was retrained and the grid
    # refreshed with real predictions
    assert pipe.segmentor_params is None  # setup only so far
    _key(gui, "v")
    verts = [(2, 2), (2, 20), (20, 20)]
    for v in verts:
        _move_click(gui, *v)
    _move_click(gui, *verts[0])
    assert gui.get_labels()[0].sum() > 0

    grid_before = gui.out_grid.copy()
    _click_button(gui, gui.train_btn)
    assert pipe.segmentor_params is not None, "Update/Train did not train"
    assert not np.allclose(gui.out_grid, grid_before), (
        "grid did not refresh after training"
    )
    assert gui.status.label.get_text() == "Status: Labelling"
    # the painted mask became the pipeline's one-shot label
    assert np.asarray(pipe.one_shot_label).sum() > 0

    _click_button(gui, gui.save_btn)
    import os

    assert any(f.startswith("snap_") for f in os.listdir(gui.snap_dir))
