from ganecdotes_tpu.metrics.segmentation import (
    get_mask_iou,
    get_bb_iou,
    get_mask_dice,
    get_bb_dice,
    get_weighted_iou,
    get_bin_iou,
    get_pd_at_iou_threshold,
    get_iou_vs_pd_curve,
    plot_iou_vs_pd_curve,
)
