from tpu_qe.ops.filter import compact, filter_table  # noqa: F401
from tpu_qe.ops.aggregate import (group_aggregate,  # noqa: F401
                                  group_aggregate_multi,
                                  group_aggregate_sorted)
from tpu_qe.ops.join import (join_fk, join_inner, join_sorted,  # noqa: F401
                             expand_ranges)
from tpu_qe.ops.topk import top_k  # noqa: F401

# out-of-core family (device-generated benchmark data models, fully
# device-verified; see each module's docstring for the design)
from tpu_qe.ops.bigagg import (aggregate_big,  # noqa: F401
                               aggregate_big_multi)
from tpu_qe.ops.bigjoin import join_big  # noqa: F401
from tpu_qe.ops.bigtopk import top_k_big  # noqa: F401
from tpu_qe.ops.bigpipe import join_aggregate_big  # noqa: F401
from tpu_qe.ops.dbigagg import aggregate_big_distributed  # noqa: F401
from tpu_qe.ops.dbigjoin import join_big_distributed  # noqa: F401
