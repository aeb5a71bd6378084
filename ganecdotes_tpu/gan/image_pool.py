"""History buffer of generated images (pix2pix-style).

Behavioral twin of the reference ImagePool (models/baggan/gan_util.py:416-487):
a capacity-bounded pool of previously generated images; ``query`` returns,
per image, either the fresh image (p=0.5) or a random pooled one which is
then replaced by the fresh image. Lets the discriminator train against a
history of generators rather than only the newest one.

Host-side by design: the pool is a sampling decision, not compute — it holds
numpy copies and feeds whatever batch the jitted D step receives.
"""

import numpy as np


class ImagePool:
    def __init__(self, pool_size, seed=0):
        self.pool_size = pool_size
        self.num_imgs = 0
        self.images = []
        self._rng = np.random.RandomState(seed)

    def query(self, images):
        """images: (B, H, W, C) array (jax or numpy). Returns same shape."""
        if self.pool_size == 0:
            return images
        images = np.asarray(images)
        out = []
        for image in images:
            if self.num_imgs < self.pool_size:
                self.num_imgs += 1
                self.images.append(image.copy())
                out.append(image)
            elif self._rng.uniform() > 0.5:
                idx = self._rng.randint(0, self.pool_size)
                out.append(self.images[idx].copy())
                self.images[idx] = image.copy()
            else:
                out.append(image)
        return np.stack(out, axis=0)
