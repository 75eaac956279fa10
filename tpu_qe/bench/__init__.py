from tpu_qe.bench.sol import hbm_peak_bytes_per_s, sort_sol_seconds  # noqa: F401
