from .base import DenoiseModel
from ..ops import BwdGradientOp, CenteredGradientOp, FwdGradientOp


def tv_model() -> DenoiseModel:
    """Scalar/patch-weighted TV denoising model (reference:
    ``src/TVLearningFunctionVec.jl:17`` — forward-difference gradient)."""
    return DenoiseModel(ops=(FwdGradientOp(),), name="tv")


def sumregs_model() -> DenoiseModel:
    """Sum-of-regularizers model with forward/backward/centered gradients
    (reference: ``src/SumRegsLearningFunction.jl:8-11``)."""
    return DenoiseModel(
        ops=(FwdGradientOp(), BwdGradientOp(), CenteredGradientOp()),
        name="sumregs")


def vtv_model() -> DenoiseModel:
    """Vectorial (color) TV: per-pixel Frobenius norm over the stacked
    channel gradients ‖(∇u)_pix‖_F — channels coupled through the dual
    projection.  Beyond-reference model family (the reference is
    grayscale-only, ``src/BPLDenoising.jl:331-332`` converts to Gray);
    same forward-difference gradient as ``tv_model``."""
    return DenoiseModel(ops=(FwdGradientOp(),), channels=True, name="vtv")


__all__ = ["DenoiseModel", "tv_model", "sumregs_model", "vtv_model"]
