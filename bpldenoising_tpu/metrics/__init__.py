from .quality import l2_cost, psnr, ssim

__all__ = ["psnr", "ssim", "l2_cost"]
