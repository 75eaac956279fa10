"""Test configuration.

Tests run on a fake 8-device CPU mesh by default (the TPU-world equivalent of
a mock backend — the reference has none, SURVEY.md §4), so multi-chip sharding
logic is exercised without TPU hardware. Pallas kernels run in interpret mode
on CPU (tpu_qe.kernels auto-detects the backend).

Set TPU_QE_TEST_PLATFORM=tpu to run the suite against real hardware instead.
"""

import os

_platform = os.environ.get("TPU_QE_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if _platform == "cpu":
    # Must go through jax.config (not just the env var): this container's
    # site hook registers the TPU PJRT plugin at interpreter start.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)
