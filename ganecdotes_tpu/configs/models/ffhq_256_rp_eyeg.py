from ganecdotes_tpu import ROOT_DIR

# Pretrained generator checkpoint (rosinality g_ema layout, converted at load
# time by ganecdotes_tpu.models.stylegan2.convert). Missing file => the
# pipeline falls back to a randomly initialized generator (no checkpoints
# ship with this repo).
model_path = ROOT_DIR + '/checkpoints/standard/ffhq_256_rp_eyeg/stylegan2-ffhq-config-f.pt'

num_latents_for_mean = 4096
truncation = 0.7
image_size = 256
latent_dim = 512

gen_args = dict(size=image_size,
                style_dim=latent_dim,
                n_mlp=8)

is_baggan = False

sample_latents = ROOT_DIR + '/checkpoints/standard/ffhq_256_rp_eyeg/latents.pt'
sample_labels  = ROOT_DIR + '/checkpoints/standard/ffhq_256_rp_eyeg/labels.pt'
sample_images  = ROOT_DIR + '/checkpoints/standard/ffhq_256_rp_eyeg/images/'

one_shot_ind = 21

classes = ['background',
           'glasses']
