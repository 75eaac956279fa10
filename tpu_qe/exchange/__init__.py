from tpu_qe.exchange.dsort import (  # noqa: F401
    DistSortResult,
    distributed_sort,
    distributed_sort_numpy,
    make_mesh,
)
