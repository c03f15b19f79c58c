from .misc import Timer, AverageMeter, iou_thresholded, mask_white, fliplr, channel_shuffle
from .profiling import profile_trace, enable_nan_checks, StepTimer
