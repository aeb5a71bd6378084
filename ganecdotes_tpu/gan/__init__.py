from ganecdotes_tpu.gan.losses import (
    gan_loss,
    logistic_loss,
    nonsaturating_loss,
    r1_penalty,
    path_length_penalty,
    gradient_penalty,
    normal_nll_loss,
    dice_loss,
)
from ganecdotes_tpu.gan.ada import augment, AdaptiveAugment, sample_affine, sample_color
from ganecdotes_tpu.gan.image_pool import ImagePool
from ganecdotes_tpu.gan.train import (
    BagGANHQ,
    GANBaseModel,
    get_scheduler,
    initialize_params,
)
