from tpu_qe.sort.driver import (  # noqa: F401
    BEST_BACKEND,
    sort_u64,
    sort_u64_numpy,
)
