from .sumregs import make_sumregs_learning_function, sumregs_learning_function
from .tv import make_tv_learning_function, tv_learning_function

__all__ = [
    "tv_learning_function", "make_tv_learning_function",
    "sumregs_learning_function", "make_sumregs_learning_function",
]

from .tgv import tgv_learning_function, make_tgv_learning_function
__all__ += ["tgv_learning_function", "make_tgv_learning_function"]

from .vtv import vtv_learning_function, make_vtv_learning_function
__all__ += ["vtv_learning_function", "make_vtv_learning_function"]
from .tvl1 import tvl1_learning_function, make_tvl1_learning_function
__all__ += ["tvl1_learning_function", "make_tvl1_learning_function"]
