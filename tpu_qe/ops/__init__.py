from tpu_qe.ops.filter import compact, filter_table  # noqa: F401
from tpu_qe.ops.aggregate import (group_aggregate,  # noqa: F401
                                  group_aggregate_multi,
                                  group_aggregate_sorted)
from tpu_qe.ops.join import (join_fk, join_inner, join_sorted,  # noqa: F401
                             expand_ranges)
from tpu_qe.ops.topk import top_k  # noqa: F401
