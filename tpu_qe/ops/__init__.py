from tpu_qe.ops.filter import compact, filter_table  # noqa: F401
from tpu_qe.ops.aggregate import (group_aggregate,  # noqa: F401
                                  group_aggregate_multi,
                                  group_aggregate_sorted)
from tpu_qe.ops.join import (join_fk, join_inner, join_outer,  # noqa: F401
                             join_sorted, expand_ranges)
from tpu_qe.ops.orderby import sort_by_multi  # noqa: F401
from tpu_qe.ops.setops import set_op  # noqa: F401
from tpu_qe.ops.quantile import (group_quantile, median,  # noqa: F401
                                 quantile)
from tpu_qe.ops.topk import top_k  # noqa: F401
from tpu_qe.ops.window import window  # noqa: F401

# out-of-core family (device-generated benchmark data models, fully
# device-verified; see each module's docstring for the design). Exported
# LAZILY (PEP 562): these modules import the sort drivers, which import
# ops.join — eager imports here would cycle through this package init.
_BIG_EXPORTS = {
    "aggregate_big": "bigagg",
    "aggregate_big_multi": "bigagg",
    "join_big": "bigjoin",
    "join_big_outer": "bigouter",
    "count_distinct_big": "bigdistinct",
    "count_distinct_big_distributed": "dbigdistinct",
    "set_op_big": "bigsetops",
    "set_op_big_distributed": "dbigsetops",
    "order_by_big": "bigorderby",
    "order_by_big_distributed": "dbigorderby",
    "quantile_big": "bigquantile",
    "quantile_big_distributed": "dbigquantile",
    "top_k_big": "bigtopk",
    "window_big": "bigwindow",
    "window_big_distributed": "dbigwindow",
    "top_k_big_distributed": "dbigtopk",
    "join_aggregate_big": "bigpipe",
    "join_aggregate_big_distributed": "dbigpipe",
    "aggregate_big_distributed": "dbigagg",
    "join_big_distributed": "dbigjoin",
}


def __getattr__(name):
    if name in _BIG_EXPORTS:
        import importlib
        mod = importlib.import_module(f"tpu_qe.ops.{_BIG_EXPORTS[name]}")
        return getattr(mod, name)
    raise AttributeError(f"module 'tpu_qe.ops' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_BIG_EXPORTS))
