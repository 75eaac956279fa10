from tpu_qe.sort.driver import sort_u64, sort_u64_numpy  # noqa: F401
