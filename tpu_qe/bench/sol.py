"""Speed-of-light model for the sort/query kernels.

The reference publishes no numbers (SURVEY.md §6); per BASELINE.md the
performance target is defined against the HBM-bandwidth speed of light:
bytes that MUST move per pass, divided by peak HBM bandwidth.

Bytes-moved model for one LSD radix pass over n elements:
  read keys (8B) + payload (4B per u32 column)
  write keys (8B) + payload
  (histogram traffic is O(radix * num_blocks) — negligible at real sizes)

A fused single-kernel pass therefore moves 2 * (8 + 4*p) bytes per element;
a split histogram+scatter pipeline (like the reference's, which reads keys
in both kernels) adds one more key read.
"""

from __future__ import annotations

import functools

import jax

# Peak HBM bandwidth per chip, bytes/s.
_HBM_PEAK = {
    "v5e": 819e9,       # TPU v5 lite
    "v5litepod": 819e9,
    "v4": 1228e9,
    "v5p": 2765e9,
    "v6e": 1640e9,
}


@functools.cache
def device_kind() -> str:
    try:
        return jax.devices()[0].device_kind.lower()
    except Exception:
        return "unknown"


def hbm_peak_bytes_per_s() -> float:
    kind = device_kind()
    for k, v in _HBM_PEAK.items():
        if k in kind.replace(" ", ""):
            return v
    return _HBM_PEAK["v5e"]


def sort_pass_bytes(n: int, payload_cols: int = 1, key_bytes: int = 8,
                    fused: bool = True) -> int:
    per_elem = key_bytes + 4 * payload_cols
    reads = per_elem if fused else per_elem + key_bytes
    return n * (reads + per_elem)


def sort_sol_seconds(n: int, num_passes: int, payload_cols: int = 1,
                     key_bytes: int = 8, fused: bool = True) -> float:
    return (num_passes * sort_pass_bytes(n, payload_cols, key_bytes, fused)
            / hbm_peak_bytes_per_s())
