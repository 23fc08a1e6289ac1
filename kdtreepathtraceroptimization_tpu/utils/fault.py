"""Failure detection & diagnosis for TPU render jobs.

The reference's failure story is cudaDeviceSynchronize + checkCUDAError
aborts (pathtrace.cu). On a tunneled TPU pool the observed failure
modes are different — worker crashes that take the whole process,
compile-service hangs, collective rendezvous stalls, HBM exhaustion —
and a long render job should survive and EXPLAIN them, not die. This
module gives the library-level pieces bench.py's crash isolation was
built from (BENCH_r02 recorded an rc=1 TPU-worker crash; the harness
now routes around those):

- :func:`classify_failure` maps a (returncode, stderr) pair to a known
  failure kind with remediation advice;
- :func:`run_isolated` runs a command in a subprocess jail with a
  timeout and returns the outcome WITH its classification, so callers
  can fall back (next config, smaller shapes, CPU) instead of dying.
"""

from __future__ import annotations

import subprocess
import sys
from typing import Optional

# Signature table: (substring, kind, advice). First match wins; drawn
# from failures actually observed on the tunneled v5e pool (rounds 2-4).
_SIGNATURES = (
    ("FailedPrecondition", "tpu-worker-fault",
     "TPU backend rejected the call (worker restarted or tunnel "
     "dropped mid-run). Retry once; if persistent, re-create the "
     "client process — the backend handle is poisoned."),
    ("TPU backend error", "tpu-worker-fault",
     "TPU worker crashed. Retry in a fresh process; shrink the "
     "wavefront if it recurs at the same shape."),
    ("remote_compile", "compile-service",
     "The remote compile service dropped the connection. Retry; "
     "persistent failures mean the pool's compile service is down — "
     "wait or fall back to CPU."),
    ("rendezvous", "collective-stall",
     "A cross-device collective waited on missing participants. Check "
     "that every process entered the same computation; on virtual "
     "devices this is usually benign timeout noise."),
    ("RESOURCE_EXHAUSTED", "oom",
     "HBM exhausted. Reduce resolution / batch, enable donation, or "
     "split the film across iterations."),
    ("Mosaic", "kernel-compile",
     "A Pallas/Mosaic kernel failed to lower. This is a code/shape "
     "bug, not an environment fault — see the operation in the trace."),
    ("DEADLINE_EXCEEDED", "timeout",
     "RPC deadline exceeded over the tunnel. Retry with chained "
     "on-device iterations (fewer dispatches)."),
)


def classify_failure(returncode: int, stderr: str,
                     timed_out: bool = False) -> dict:
    """Map a failed run to {kind, advice, detail}."""
    if timed_out:
        return {
            "kind": "hang",
            "advice": "No progress before the timeout — on this pool that "
                      "is usually the compile service or tunnel stalling "
                      "(process sits at ~0 CPU). Retry later; probe with a "
                      "trivial jitted op first.",
            "detail": (stderr or "").strip().splitlines()[-3:],
        }
    text = stderr or ""
    for needle, kind, advice in _SIGNATURES:
        if needle in text:
            return {"kind": kind, "advice": advice,
                    "detail": [l for l in text.splitlines() if needle in l][:3]}
    return {"kind": "unknown", "advice": "Unrecognized failure; see detail.",
            "detail": text.strip().splitlines()[-5:]}


def run_isolated(argv, timeout: Optional[float] = None,
                 python: bool = True) -> dict:
    """Run ``argv`` in a subprocess jail; never raises on failure.

    Returns {ok, returncode, stdout, stderr, failure} where ``failure``
    is the :func:`classify_failure` result (None when ok). ``python``
    prefixes the current interpreter.
    """
    cmd = ([sys.executable] + list(argv)) if python else list(argv)
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired as e:
        return {
            "ok": False, "returncode": None,
            "stdout": e.stdout or "", "stderr": e.stderr or "",
            "failure": classify_failure(-1, e.stderr or "", timed_out=True),
        }
    ok = proc.returncode == 0
    return {
        "ok": ok, "returncode": proc.returncode,
        "stdout": proc.stdout, "stderr": proc.stderr,
        "failure": None if ok else classify_failure(proc.returncode,
                                                    proc.stderr),
    }
