from .pdps import denoise_pdps, tv_denoise, sumregs_denoise, PDPS_DEFAULTS

__all__ = ["denoise_pdps", "tv_denoise", "sumregs_denoise", "PDPS_DEFAULTS"]
