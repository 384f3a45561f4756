from .hypergrad import HypergradConfig, exact_hypergrad, reg_hypergrad
from .hypergrad_pallas import (exact_hypergrad_pallas,
                              reg_hypergrad_pallas)
from .implicit import diff_denoise, diff_tv_denoise, make_diff_denoise
from .pdps import denoise_pdps, tv_denoise, sumregs_denoise, PDPS_DEFAULTS
from .pdps_pallas import denoise_pdps_pallas

__all__ = ["denoise_pdps", "denoise_pdps_pallas", "tv_denoise",
           "sumregs_denoise", "PDPS_DEFAULTS",
           "HypergradConfig", "exact_hypergrad", "exact_hypergrad_pallas",
           "reg_hypergrad", "reg_hypergrad_pallas",
           "diff_tv_denoise", "diff_denoise", "make_diff_denoise"]

from .tgv import (tgv_denoise_pdps, tgv_energy, diff_tgv_denoise,
                  make_diff_tgv_denoise)
from .tgv_pallas import tgv_denoise_pdps_pallas
__all__ += ["tgv_denoise_pdps", "tgv_energy", "diff_tgv_denoise",
            "make_diff_tgv_denoise", "tgv_denoise_pdps_pallas"]

from .pdps import vtv_denoise
from .vtv import (vtv_implicit_cotangents, diff_vtv_denoise,
                  make_diff_vtv_denoise)
__all__ += ["vtv_denoise", "vtv_implicit_cotangents", "diff_vtv_denoise",
            "make_diff_vtv_denoise"]

from .tvl1 import tvl1_denoise, tvl1_energy
__all__ += ["tvl1_denoise", "tvl1_energy"]
from .tvl1_pallas import tvl1_denoise_pallas
__all__ += ["tvl1_denoise_pallas"]
from .tvl1_huber import (diff_tvl1_denoise, make_diff_tvl1_denoise,
                         tvl1_huber_denoise, tvl1_huber_energy,
                         tvl1_huber_hypergrad)
__all__ += ["tvl1_huber_denoise", "tvl1_huber_energy",
            "tvl1_huber_hypergrad", "make_diff_tvl1_denoise",
            "diff_tvl1_denoise"]
from .tvl1_huber_pallas import tvl1_huber_denoise_pallas
__all__ += ["tvl1_huber_denoise_pallas"]
