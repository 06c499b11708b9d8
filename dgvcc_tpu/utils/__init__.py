from dgvcc_tpu.utils.misc import (
    AverageMeter,
    DictAvgMeter,
    cal_inner_area,
    denormalize,
    divide_img_into_patches,
    get_current_datetime,
    get_padding,
    random_crop,
    seed_everything,
)

__all__ = [
    "AverageMeter",
    "DictAvgMeter",
    "cal_inner_area",
    "denormalize",
    "divide_img_into_patches",
    "get_current_datetime",
    "get_padding",
    "random_crop",
    "seed_everything",
]
