from .pixelwise import l1_loss, l2_loss
from .ssim import ssim_loss
from .smooth import smooth_loss, second_order_smooth_loss
from .normal import norm_loss, norm_from_depth, norm_reg_loss
from .zero_one import zero_one_loss

__all__ = [
    "l1_loss", "l2_loss", "ssim_loss", "smooth_loss",
    "second_order_smooth_loss", "norm_loss", "norm_from_depth",
    "norm_reg_loss", "zero_one_loss",
]
