from tpu_qe.sort.driver import (  # noqa: F401
    BEST_BACKEND,
    BEST_UNIQUE_PAYLOAD_BACKEND,
    sort_u64,
    sort_u64_numpy,
)
