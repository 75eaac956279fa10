from tpu_qe.exchange.dsort import (  # noqa: F401
    DistSortResult,
    distributed_sort,
    distributed_sort_numpy,
    make_mesh,
)
from tpu_qe.exchange.dops import (  # noqa: F401
    distributed_aggregate,
    distributed_aggregate_numpy,
    plan_aggregate_capacity,
    distributed_count_distinct,
    distributed_count_distinct_numpy,
    plan_count_distinct_capacity,
    distributed_join_aggregate,
    distributed_join_aggregate_numpy,
    distributed_join_fk,
    distributed_join_fk_numpy,
    distributed_join_inner,
    distributed_join_inner_numpy,
    plan_join_inner_capacity,
    distributed_set_op,
    distributed_set_op_numpy,
    distributed_top_k,
    distributed_top_k_numpy,
)
from tpu_qe.exchange.dorderby import (  # noqa: F401
    distributed_order_by,
    distributed_order_by_numpy,
    plan_order_by_capacity,
)
from tpu_qe.exchange.dquantile import (  # noqa: F401
    distributed_group_quantile,
    distributed_group_quantile_numpy,
    distributed_quantile,
    distributed_quantile_numpy,
)
from tpu_qe.exchange.dwindow import (  # noqa: F401
    DistWindowResult,
    distributed_window,
    distributed_window_numpy,
    plan_window_capacity,
)
from tpu_qe.exchange.shuffle import (  # noqa: F401
    AXIS,
    exchange,
    route_by_splitters,
    sample_splitters,
)
