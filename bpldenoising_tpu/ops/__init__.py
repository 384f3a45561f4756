from .linop import LinOp, AdjointOp, ZeroOp, IdentityOp
from .grad import (
    FwdGradientOp,
    BwdGradientOp,
    CenteredGradientOp,
    GradientOp,
)
from .patch import PatchOp
from .field import xi, scalarprod, norm21, proj_norm21_ball

__all__ = [
    "LinOp", "AdjointOp", "ZeroOp", "IdentityOp",
    "FwdGradientOp", "BwdGradientOp", "CenteredGradientOp", "GradientOp",
    "PatchOp",
    "xi", "scalarprod", "norm21", "proj_norm21_ball",
]

from .tgv import SymGradientOp, sym_grad, sym_div, TGV_OPNORM_SQ
__all__ += ["SymGradientOp", "sym_grad", "sym_div", "TGV_OPNORM_SQ"]
