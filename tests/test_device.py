"""Accelerator health probe for interactive front-ends (VERDICT item 10):
a wedged device must degrade to CPU, not hang the app."""

from othello_reinforcement_learning_test_tpu.utils.device import (
    probe_default_device,
    resolve_device,
)

OK_PROBE = "print(64, 'cpu')"
HANG_PROBE = "import time; time.sleep(60)"
CRASH_PROBE = "raise SystemExit(3)"
GARBAGE_PROBE = "print('not a probe result')"


def test_cpu_request_skips_probe():
    # must not spawn anything: a hanging probe string is never executed
    assert resolve_device("cpu", timeout_s=0.1, probe_code=HANG_PROBE) == "cpu"


def test_healthy_device_keeps_auto():
    # generous timeout: these healthy-path tests check probe *parsing*;
    # under a fully loaded box (parallel pytest workers) the subprocess
    # interpreter alone can take >10s to start
    assert resolve_device("auto", timeout_s=120, probe_code=OK_PROBE,
                          log=None) == "auto"


def test_wedged_device_falls_back_to_cpu():
    msgs = []
    out = resolve_device("auto", timeout_s=1.5, probe_code=HANG_PROBE,
                         log=msgs.append)
    assert out == "cpu"
    assert msgs and "falling back to CPU" in msgs[0]


def test_crashing_device_falls_back_to_cpu():
    assert resolve_device("auto", timeout_s=120, probe_code=CRASH_PROBE,
                          log=None) == "cpu"


def test_garbage_probe_output_is_failure():
    assert probe_default_device(timeout_s=120,
                                probe_code=GARBAGE_PROBE) is None


def test_probe_reports_platform():
    assert probe_default_device(timeout_s=120, probe_code=OK_PROBE) == "cpu"
