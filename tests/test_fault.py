"""Failure detection/diagnosis (utils/fault.py): signature
classification and the subprocess jail (SURVEY.md §5 "failure
detection / recovery"; the library-level pieces behind bench.py's
crash isolation)."""

import sys

from kdtreepathtraceroptimization_tpu.utils.fault import (
    classify_failure,
    run_isolated,
)


def test_classify_known_signatures():
    cases = {
        "E ... TPU backend error (FailedPrecondition): x": "tpu-worker-fault",
        "jax.errors.JaxRuntimeError: INTERNAL: http://127.0.0.1:1/"
        "remote_compile: read body": "compile-service",
        "rendezvous.cc:100] waiting for all reduce": "collective-stall",
        "RESOURCE_EXHAUSTED: while allocating 3.2G": "oom",
        "Mosaic failed to lower scalar bitcast": "kernel-compile",
    }
    for stderr, kind in cases.items():
        got = classify_failure(1, stderr)
        assert got["kind"] == kind, (stderr, got)
    assert classify_failure(1, "something else")["kind"] == "unknown"
    assert classify_failure(-1, "", timed_out=True)["kind"] == "hang"


def test_run_isolated_success_and_crash():
    ok = run_isolated(["-c", "print('fine')"])
    assert ok["ok"] and ok["failure"] is None and "fine" in ok["stdout"]

    bad = run_isolated(
        ["-c", "import sys; print('TPU backend error (FailedPrecondition)',"
               " file=sys.stderr); sys.exit(3)"]
    )
    assert not bad["ok"] and bad["returncode"] == 3
    assert bad["failure"]["kind"] == "tpu-worker-fault"
    assert "Retry" in bad["failure"]["advice"]


def test_run_isolated_timeout():
    out = run_isolated(["-c", "import time; time.sleep(30)"], timeout=2)
    assert not out["ok"] and out["failure"]["kind"] == "hang"
