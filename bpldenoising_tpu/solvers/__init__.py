from .implicit import diff_denoise, diff_tv_denoise, make_diff_denoise
from .pdps import denoise_pdps, tv_denoise, sumregs_denoise, PDPS_DEFAULTS

__all__ = ["denoise_pdps", "tv_denoise", "sumregs_denoise", "PDPS_DEFAULTS",
           "diff_tv_denoise", "diff_denoise", "make_diff_denoise"]
