from .chamfer import chamfer_distance
from .recon import recon_data, mask_iou_loss
from .attributes import recon_att, angle2xy
from . import mesh_reg
from . import gan
