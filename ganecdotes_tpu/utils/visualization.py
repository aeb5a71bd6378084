"""Visualization helpers — counterpart of lib/util/visualization.py:17-388
and the color/mask helpers in lib/gui/labeller.py (sample_label_colors,
visualize_label_mask). Pure host-side (numpy/PIL/matplotlib)."""

import numpy as np


def sample_label_colors(n=1):
    """n colors at evenly spaced hues, s=0.5 v=1.0 (ref labeller.py:490-501)."""
    from matplotlib.colors import hsv_to_rgb

    h = np.linspace(0.0, 1.0, n)[:, np.newaxis]
    s = np.ones((n, 1)) * 0.5
    v = np.ones((n, 1)) * 1.0
    return hsv_to_rgb(np.concatenate([h, s, v], axis=1))


def visualize_label_mask(mask, color_map):
    """Integer mask (H, W) -> RGB; class 0 stays black (ref labeller.py:504-514)."""
    mask = np.asarray(mask)
    if mask.ndim == 3:
        mask = mask.squeeze(0)
    h, w = mask.shape
    out = np.zeros((h, w, 3), dtype=np.float32)
    for i in range(1, len(color_map)):
        out[mask == i] = color_map[i]
    return out


def create_pil_collage(images, fname=None, grid=None, return_im=False):
    """Tile images (HW or HWC uint8/float arrays) into one PNG (ref :17-70)."""
    from PIL import Image

    imgs = []
    for im in images:
        im = np.asarray(im)
        if im.dtype != np.uint8:
            lo, hi = im.min(), im.max()
            im = np.uint8((im - lo) / (hi - lo + 1e-12) * 255)
        if im.ndim == 2:
            im = np.stack([im] * 3, axis=-1)
        imgs.append(im)

    if grid is None:
        rows, cols = 1, len(imgs)
    else:
        rows, cols = grid

    h = max(i.shape[0] for i in imgs)
    w = max(i.shape[1] for i in imgs)
    canvas = np.zeros((rows * h, cols * w, 3), dtype=np.uint8)
    for k, im in enumerate(imgs[: rows * cols]):
        r, c = k // cols, k % cols
        canvas[r * h : r * h + im.shape[0], c * w : c * w + im.shape[1]] = im

    pil = Image.fromarray(canvas)
    if fname is not None:
        pil.save(fname)
    if return_im:
        return canvas
    return pil


def quick_imshow(nrows, ncols=1, images=None, colorbar=False, colormap="jet",
                 fname=None):
    """Grid of subplots (ref :73-157); returns the figure."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(nrows, ncols, squeeze=False)
    if images is not None:
        for k, im in enumerate(images[: nrows * ncols]):
            ax = axes[k // ncols][k % ncols]
            m = ax.imshow(np.asarray(im), cmap=colormap)
            ax.axis("off")
            if colorbar:
                fig.colorbar(m, ax=ax)
    if fname is not None:
        fig.savefig(fname)
    return fig


def create_gif(fname, input_im, stride=1, scale=None, fps=5):
    """Write a stack of frames (T, H, W[, C]) to an animated GIF (ref :290-347)."""
    from PIL import Image

    frames = []
    arr = np.asarray(input_im)
    for t in range(0, arr.shape[0], stride):
        im = arr[t]
        if im.dtype != np.uint8:
            lo, hi = im.min(), im.max()
            im = np.uint8((im - lo) / (hi - lo + 1e-12) * 255)
        if im.ndim == 2:
            im = np.stack([im] * 3, axis=-1)
        pil = Image.fromarray(im)
        if scale is not None:
            pil = pil.resize((int(pil.width * scale), int(pil.height * scale)))
        frames.append(pil)
    frames[0].save(
        fname, save_all=True, append_images=frames[1:],
        duration=int(1000 / fps), loop=0,
    )


def slide_show(image, dt=0.01, vmax=None, vmin=None):
    """Animate a (w, h, d) volume along depth (ref visualization.py:160-191)."""
    import matplotlib.pyplot as plt

    image = np.asarray(image)
    fig, ax = plt.subplots()
    im = ax.imshow(image[:, :, 0], vmax=vmax, vmin=vmin)
    for k in range(image.shape[2]):
        im.set_data(image[:, :, k])
        ax.set_title(f"slice {k}")
        plt.pause(dt)
    plt.close(fig)


def plot_boxplot(fname, vectors, titles=None, lbl_rotation=None):
    """Box plot of (labels, data) vector pairs (ref visualization.py:194-227)."""
    import matplotlib.pyplot as plt

    labels, data = vectors
    fig, ax = plt.subplots()
    ax.boxplot(data, tick_labels=list(labels))
    titles = titles or {}
    ax.set_xlabel(titles.get("xlabel", ""))
    ax.set_ylabel(titles.get("ylabel", ""))
    ax.set_title(titles.get("title", ""))
    if lbl_rotation is not None:
        plt.setp(ax.get_xticklabels(), rotation=lbl_rotation)
    fig.tight_layout()
    fig.savefig(fname)
    plt.close(fig)


def plot_histogram_1d(fname, vectors, titles=None, legend=True, is_hist=True,
                      hist_params=None):
    """Overlaid 1-D histograms/line plots (ref visualization.py:230-270)."""
    import matplotlib.pyplot as plt

    labels, data = vectors
    titles = titles or {}
    hist_params = hist_params or {}
    fig, ax = plt.subplots()
    for lbl, vec in zip(labels, data):
        if is_hist:
            ax.hist(np.asarray(vec), label=str(lbl), alpha=0.6, **hist_params)
        else:
            ax.plot(np.asarray(vec), label=str(lbl))
    ax.set_xlabel(titles.get("xlabel", ""))
    ax.set_ylabel(titles.get("ylabel", ""))
    ax.set_title(titles.get("title", ""))
    if legend:
        ax.legend()
    fig.tight_layout()
    fig.savefig(fname)
    plt.close(fig)


def load_image(im_path):
    """Load png/jpg/tiff/npy/npz/FITS images (ref visualization.py:273-287)."""
    import os

    ext = os.path.splitext(im_path)[-1].lower()
    if ext in (".png", ".jpg", ".jpeg", ".tiff"):
        from PIL import Image

        return np.asarray(Image.open(im_path))
    if ext == ".npy":
        return np.load(im_path)
    if ext == ".npz":
        return np.load(im_path)["arr_0"]
    if ext in (".fits", ".gz"):
        from ganecdotes_tpu.utils.fits import read_fits_data

        return read_fits_data(im_path)
    raise AssertionError("Format not supported!")


def plot_image_on_axis(ax, image, title=None, cmap=None, vmin=None, vmax=None):
    """Render one image on a matplotlib axis (ref visualization.py:350-388)."""
    ax.imshow(np.asarray(image), cmap=cmap, vmin=vmin, vmax=vmax)
    ax.set_axis_off()
    if title:
        ax.set_title(title)
    return ax
