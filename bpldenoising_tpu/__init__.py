"""bpldenoising_tpu — TPU-native bilevel parameter learning for TV denoising.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
dvillacis/BPLDenoising (bilevel learning of TV-regularization weights via a
nonsmooth trust-region method over a primal–dual inner solver), re-designed
TPU-first.  See SURVEY.md for the layer map and reference citations.
"""

from .experiments import (
    TVDenoise,
    generate_2d_cost_plot,
    generate_2d_tv_cost,
    generate_cost_plot,
    generate_scalar_tv_cost,
    patch_bilevel_sumregs_learn,
    patch_bilevel_tv_learn,
    scalar_bilevel_sumregs_learn,
    scalar_bilevel_tv_learn,
    validate_sumregs_parameter,
    validate_tv_parameter,
)
from .bilevel import bilevel_learn
from .learning import sumregs_learning_function, tv_learning_function
from .models import sumregs_model, tv_model
from .solvers import (denoise_pdps, sumregs_denoise, tv_denoise,
                      diff_tv_denoise, diff_denoise)

__version__ = "0.1.0"

__all__ = [
    "scalar_bilevel_tv_learn", "patch_bilevel_tv_learn",
    "scalar_bilevel_sumregs_learn", "patch_bilevel_sumregs_learn",
    "validate_tv_parameter", "validate_sumregs_parameter",
    "generate_scalar_tv_cost", "generate_cost_plot",
    "generate_2d_tv_cost", "generate_2d_cost_plot",
    "TVDenoise", "bilevel_learn",
    "tv_learning_function", "sumregs_learning_function",
    "tv_model", "sumregs_model",
    "denoise_pdps", "tv_denoise", "sumregs_denoise",
    "diff_tv_denoise", "diff_denoise",
]

from .experiments import (TGVDenoise, patch_bilevel_tgv_learn,
                          scalar_bilevel_tgv_learn, validate_tgv_parameter)
from .learning import tgv_learning_function
from .solvers import (diff_tgv_denoise, tgv_denoise_pdps,
                      tgv_denoise_pdps_pallas)
__all__ += ["TGVDenoise", "scalar_bilevel_tgv_learn",
            "patch_bilevel_tgv_learn",
            "validate_tgv_parameter", "tgv_learning_function",
            "diff_tgv_denoise", "tgv_denoise_pdps",
            "tgv_denoise_pdps_pallas"]

from .experiments import (VTVDenoise, patch_bilevel_vtv_learn,
                          scalar_bilevel_vtv_learn, validate_vtv_parameter)
from .learning import vtv_learning_function
from .solvers import diff_vtv_denoise, vtv_denoise
__all__ += ["VTVDenoise", "scalar_bilevel_vtv_learn",
            "patch_bilevel_vtv_learn", "validate_vtv_parameter",
            "vtv_learning_function", "diff_vtv_denoise", "vtv_denoise"]

from .experiments import (TVL1Denoise, generate_tvl1_cost,
                          generate_tvl1_cost_plot, patch_bilevel_tvl1_learn,
                          scalar_bilevel_tvl1_learn, validate_tvl1_parameter)
from .solvers import (diff_tvl1_denoise, tvl1_denoise, tvl1_energy,
                      tvl1_huber_denoise)
__all__ += ["TVL1Denoise", "validate_tvl1_parameter", "generate_tvl1_cost",
            "generate_tvl1_cost_plot", "tvl1_denoise", "tvl1_energy",
            "scalar_bilevel_tvl1_learn", "patch_bilevel_tvl1_learn",
            "diff_tvl1_denoise", "tvl1_huber_denoise"]
