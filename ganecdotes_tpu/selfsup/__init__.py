from ganecdotes_tpu.selfsup.heads import (
    init_one_shot_segmentor,
    one_shot_segmentor_apply,
    init_pixel_classifier,
    pixel_classifier_apply,
)
from ganecdotes_tpu.selfsup.augmentor import (
    perturb_latents,
    perturbed_features,
    group_features_by_block,
)
from ganecdotes_tpu.selfsup.embed import (
    pixel_feature_maps,
    pixel_feature_gather,
    layer_channel_dims,
    project_feature_maps,
    project_gathered,
)
