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


# --- auto-retry tests whose xdist WORKER crashed -------------------------
#
# This host's XLA:CPU compiler segfaults flakily deep into long processes
# (CLAUDE.md "Platform gotchas"): one worker dies ~45 min into a full run
# and takes whichever test it was compiling down with it ("[gwN] node
# down"). The test itself passes standalone every time. Reschedule a
# crashed item ONCE on a fresh worker so a full-suite run is green
# without human adjudication; a test that crashes twice is a real
# failure and reports normally.

_crash_retried: set = set()


def pytest_handlecrashitem(crashitem, report, sched):
    """xdist hook: called on the controller when a worker crashes."""
    if crashitem not in _crash_retried:
        _crash_retried.add(crashitem)
        sched.mark_test_pending(crashitem)
        report.outcome = "rerun"  # suppress the failure report
