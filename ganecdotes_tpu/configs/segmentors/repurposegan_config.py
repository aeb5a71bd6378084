# RepurposeGAN baseline: raw concat features + dilated FCN head
# (ref configs/segmentors/repurposegan_config.py)
seg_args = dict(size='XS')

n_layers = 13
