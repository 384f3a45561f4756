from . import first_order_pallas
from .first_order import (SingleLoopResult, single_loop_learn,
                          single_loop_sumregs_learn, single_loop_tv_learn)
from .first_order_pallas import (single_loop_pallas,
                                 single_loop_pallas_tiled,
                                 single_loop_tv_pallas)
from .first_order_tgv import single_loop_tgv_learn
from .first_order_tgv_pallas import single_loop_tgv_pallas
from .first_order_tvl1 import single_loop_tvl1_learn
from .first_order_tvl1_pallas import single_loop_tvl1_pallas
from .first_order_vtv import single_loop_vtv_learn
from .first_order_vtv_pallas import single_loop_vtv_pallas
from .fused import FusedResult, bilevel_learn_fused
from .fused_tgv import bilevel_learn_tgv_fused
from .fused_tvl1 import bilevel_learn_tvl1_fused
from .fused_vtv import bilevel_learn_vtv_fused
from .harness import BilevelState, LiveView, bilevel_iterate
from .trust_region import BilevelResult, TRModel, bilevel_learn, dogleg_box

__all__ = [
    "bilevel_learn", "dogleg_box", "TRModel", "BilevelResult",
    "bilevel_iterate", "BilevelState", "LiveView",
    "single_loop_tv_learn", "single_loop_learn", "single_loop_sumregs_learn",
    "single_loop_tgv_learn", "single_loop_tgv_pallas",
    "single_loop_tvl1_learn", "single_loop_tvl1_pallas",
    "single_loop_vtv_learn", "single_loop_vtv_pallas",
    "SingleLoopResult", "single_loop_tv_pallas", "single_loop_pallas",
    "single_loop_pallas_tiled",
    "first_order_pallas",
    "bilevel_learn_fused", "bilevel_learn_tgv_fused",
    "bilevel_learn_tvl1_fused",
    "bilevel_learn_vtv_fused", "FusedResult",
]
