"""Interactive on-the-fly segmentation GUI.

Behavioral twin of lib/gui/interactive_labeller.py:28-678: the labelling
canvas plus a live 4-column output grid of (generated image, predicted mask)
pairs; buttons Regenerate (fresh latents), Update/Train (re-enters the
pipeline's train block with the painted mask), Save (snapshot PNG + latents).

The reference regenerates each output image with a separate unbatched forward
and CPU round-trips every mask (:177-218); here the grid refresh runs the
pipeline's single jitted batched generate→embed→segment program.
"""

import os
import time

import jax.numpy as jnp
import numpy as np

from ganecdotes_tpu.gui.labeller import OneShotLabellerGUI, visualize_label_mask


class InteractiveLabellerGUI(OneShotLabellerGUI):
    def __init__(self, one_shot_learner, cmap="jet", block=None):
        self.one_shot_learner = one_shot_learner
        self.num_outs = min(8, len(one_shot_learner.test_latents))
        self.out_latents = np.asarray(
            one_shot_learner.test_latents[: self.num_outs]
        )
        self.snap_dir = os.path.join(one_shot_learner.out_dir, "snaps")
        os.makedirs(self.snap_dir, exist_ok=True)
        self._grid_initialized = False

        images = one_shot_learner.transform_im_for_gui(
            one_shot_learner.one_shot_img
        )
        super().__init__(
            images, one_shot_learner.model_config.classes, cmap=cmap,
            block=False,
        )

        import matplotlib

        if block is None:
            block = matplotlib.get_backend().lower() not in ("agg", "pdf", "svg")
        if block:
            self._plt.show()

    # -- layout --------------------------------------------------------

    def _add_buttons(self):
        from matplotlib.gridspec import GridSpec

        # re-lay the figure: input canvas left, output grid right
        self.fig.clf()
        self.fig.set_size_inches(10, 6)
        self.gs = GridSpec(3, 5, figure=self.fig)
        self.ax = self.fig.add_subplot(self.gs[0:2, 0:2])
        self.ax_out = self.fig.add_subplot(self.gs[0:, 2:])
        self.fig.subplots_adjust(left=0.0, bottom=0.0, right=1.0, top=1.0,
                                 wspace=0.01)
        self.ax.axis("off")
        self.ax_out.axis("off")
        self.ax_img = self.ax.imshow(self.images[self.img_idx], cmap=self.cmap)

        self.out_grid = self.get_test_image_output(with_labels=False)
        self.ax_img_o = self.ax_out.imshow(self.out_grid, cmap=self.cmap)

        # left-column buttons (ref interactive_labeller.py:222-330 layout)
        self.class_box = self._button(
            [0.00, 0.23, 0.12, 0.04], self.class_labels[self._class],
            color=list(self.colors[self._class]),
            hovercolor=list(self.colors[self._class]),
        )
        self.prev_class_btn = self._button([0.00, 0.18, 0.05, 0.04], "<")
        self.prev_class_btn.on_clicked(self._prev_class)
        self.next_class_btn = self._button([0.07, 0.18, 0.05, 0.04], ">")
        self.next_class_btn.on_clicked(self._next_class)

        self.lasso_btn = self._button([0.00, 0.13, 0.12, 0.04], "Lasso (L)")
        self.lasso_btn.on_clicked(self._lasso)
        self.brush_up_btn = self._button([0.00, 0.08, 0.05, 0.04], "+")
        self.brush_up_btn.on_clicked(lambda e: self.brush_up())
        self.brush_down_btn = self._button([0.07, 0.08, 0.05, 0.04], "-")
        self.brush_down_btn.on_clicked(lambda e: self.brush_down())

        self.poly_btn = self._button([0.14, 0.13, 0.12, 0.04], "Polygon (P)")
        self.poly_btn.on_clicked(self._poly)
        self.undo_btn = self._button([0.14, 0.08, 0.12, 0.04], "Undo (Z)")
        self.undo_btn.on_clicked(self._undo)
        self.overlay_btn = self._button([0.14, 0.18, 0.12, 0.04], "Overlay (O)")
        self.overlay_btn.on_clicked(self._overlay)

        self.prev_img_btn = self._button([0.00, 0.03, 0.05, 0.04], "Prev")
        self.prev_img_btn.on_clicked(self._prev_img)
        self.next_img_btn = self._button([0.07, 0.03, 0.05, 0.04], "Next")
        self.next_img_btn.on_clicked(self._next_img)

        self.reset_btn = self._button(
            [0.14, 0.03, 0.12, 0.04], "Reset",
            color=[1, 0.3, 0.3], hovercolor=[1, 0.5, 0.5],
        )
        self.reset_btn.on_clicked(self._reset_evt)

        self.train_btn = self._button([0.27, 0.13, 0.14, 0.04], "Update/Train")
        self.train_btn.on_clicked(self._update_or_train)
        self.regenerate_btn = self._button([0.27, 0.08, 0.14, 0.04],
                                           "Regenerate")
        self.regenerate_btn.on_clicked(self._regenerate)
        self.save_btn = self._button([0.27, 0.03, 0.14, 0.04], "Save")
        self.save_btn.on_clicked(self._save_output)

        self.status = self._button([0.27, 0.18, 0.14, 0.04],
                                   "Status: Labelling")

    # -- output grid ---------------------------------------------------

    def get_test_image_output(self, with_labels=True):
        """(image, mask) 4-column grid via one batched jitted program
        (vs. the reference's per-sample loop, :177-218)."""
        learner = self.one_shot_learner
        latents = jnp.asarray(self.out_latents)

        if with_labels and learner.segmentor_params is not None:
            # cache the jitted program — rebuilding it per refresh would
            # recompile the whole generate→embed→segment graph on every
            # button click; _update_or_train invalidates after retraining
            if getattr(self, "_infer_cache", None) is None:
                self._infer_cache = learner._make_infer_fn()
            out = self._infer_cache(
                learner.model.params, learner.segmentor_params, latents
            )
            imgs, preds = out[0], out[1]  # ssl methods add cluster labels
            imgs, preds = np.asarray(imgs), np.asarray(preds)
        else:
            imgs = np.asarray(learner.get_image_from_latent(latents))
            preds = np.zeros(imgs.shape[:3], np.int64)

        tiles = []
        for i in range(self.num_outs):
            im = np.clip(imgs[i], -1, 1) * 0.5 + 0.5
            mask = visualize_label_mask(preds[i], learner.color_map)
            tiles.append(im)
            tiles.append(mask)

        # 4-column grid
        h, w, _ = tiles[0].shape
        rows = (len(tiles) + 3) // 4
        grid = np.zeros((rows * h, 4 * w, 3), np.float32)
        for k, t in enumerate(tiles):
            r, c = k // 4, k % 4
            grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = t
        return grid

    # -- actions -------------------------------------------------------

    def _refresh_grid(self, with_labels=True):
        self.out_grid = self.get_test_image_output(with_labels=with_labels)
        self.ax_img_o.set_data(self.out_grid)
        self.fig.canvas.draw_idle()

    def _update_or_train(self, event):
        """Re-enter the pipeline train block with the painted mask
        (ref :367-388)."""
        self.status.label.set_text("Status: Updating")
        self.one_shot_learner.one_shot_label = jnp.asarray(
            self.get_labels().astype(np.int64)
        )
        self.one_shot_learner.run_pipeline(blocks_to_run=["train"])
        # retraining may rebuild preprocessor state the program closed over
        self._infer_cache = None
        self._refresh_grid(with_labels=True)
        self.status.label.set_text("Status: Labelling")

    def _regenerate(self, event):
        """Fresh output latents via the mapping network (ref :343-364)."""
        import jax

        learner = self.one_shot_learner
        key = jax.random.fold_in(learner.key, int(time.time()))
        z = jax.random.normal(
            key, (self.num_outs, learner.model_config.latent_dim)
        )
        self.out_latents = np.asarray(learner.model.style(z))
        self._refresh_grid(
            with_labels=learner.segmentor_params is not None
        )

    def _save_output(self, event):
        """Snapshot PNG + latents (ref :330-340)."""
        stamp = time.strftime("%m%d%Y_%H%M%S", time.localtime())
        self.fig.savefig(os.path.join(self.snap_dir, f"snap_{stamp}.png"))
        np.save(os.path.join(self.snap_dir, f"latents_{stamp}.npy"),
                self.out_latents)
