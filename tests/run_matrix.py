"""Run the ENTIRE test suite under every engine configuration — the direct
analog of the reference harness running its whole suite three times
(single-threaded, multithreaded, threaded-mul —
`/root/reference/test/runtests.jl:12-24`).

Usage: ``python tests/run_matrix.py [extra pytest args]``

Each profile runs in a fresh subprocess (config is applied at
pytest_configure via ``STRIDED_TPU_TEST_PROFILE``; a fresh process also
guarantees no jit-cache leakage between configurations)."""

from __future__ import annotations

import os
import subprocess
import sys

PROFILES = ("default", "pallas", "xla", "nomxu")


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    extra = sys.argv[1:]
    failed = []
    for profile in PROFILES:
        env = dict(os.environ, STRIDED_TPU_TEST_PROFILE=profile)
        print(f"\n=== engine profile: {profile} ===", flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", here, "-q", *extra], env=env
        )
        if rc != 0:
            failed.append(profile)
    if failed:
        print(f"\nFAILED profiles: {failed}")
        return 1
    print(f"\nall {len(PROFILES)} engine profiles green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
