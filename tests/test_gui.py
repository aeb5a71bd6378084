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
    gui._regenerate(None)
    gui.add_polygon([(2, 2), (2, 20), (20, 20)])
    gui._save_output(None)
    import os

    assert any(f.startswith("snap_") for f in os.listdir(gui.snap_dir))
