from .metrics import ssim, mask_iou_metric
