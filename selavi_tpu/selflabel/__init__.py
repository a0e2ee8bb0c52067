from selavi_tpu.selflabel.sinkhorn import (
    sinkhorn_knopp,
    sinkhorn_assign,
    SinkhornResult,
)
from selavi_tpu.selflabel.marginals import MarginalState, get_marginal
from selavi_tpu.selflabel.schedule import make_sk_schedule, fast_forward_schedule
from selavi_tpu.selflabel.matching import (
    column_cost_matrix,
    greedy_swap_match,
    match_order,
)

__all__ = [
    "sinkhorn_knopp",
    "sinkhorn_assign",
    "SinkhornResult",
    "MarginalState",
    "get_marginal",
    "make_sk_schedule",
    "fast_forward_schedule",
    "column_cost_matrix",
    "greedy_swap_match",
    "match_order",
]
