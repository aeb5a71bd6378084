from ganecdotes_tpu.models.stylegan2.generator import (
    Generator,
    init_generator,
    generator_forward,
    mapping_apply,
    mean_latent,
    make_noise,
    channel_map,
    num_feature_layers,
)
