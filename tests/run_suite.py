"""Process-isolated full-suite runner.

One pytest subprocess per test module. Rationale: a single process running
all ~280 tests accumulates hundreds of live XLA:CPU executables and
eventually segfaults inside the compilation-cache write path (reproduced at
~82% of the serial suite twice; every test passes in a fresh process). The
reference runs its 162 gtest suites as isolated ctest processes
(cmake/CMakeHelper.cmake:145-170) for the same reason this driver exists:
the suite must always produce a printed pass/fail verdict.

Usage:
    python tests/run_suite.py            # full suite
    python tests/run_suite.py -m "not slow"   # smoke tier
    python tests/run_suite.py -j 2       # module-level parallelism

The persistent jax compilation cache (tests/conftest.py) keeps per-module
process startup cheap on repeat runs.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import os
import re
import subprocess
import sys
import time
from pathlib import Path

TESTS_DIR = Path(__file__).resolve().parent
REPO = TESTS_DIR.parent

_SUMMARY_RE = re.compile(
    r"(?:(?P<failed>\d+) failed)?(?:, )?(?P<passed>\d+) passed"
    r"(?:, (?P<skipped>\d+) skipped)?(?:, \d+ deselected)?"
    r"(?:, (?P<errors>\d+) error)?"
)


def run_module(module: Path, extra: list[str], timeout: int) -> dict:
    cmd = [sys.executable, "-m", "pytest", str(module), "-q", *extra]
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    start = time.perf_counter()
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, env=env, timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        rc, out = proc.returncode, proc.stdout
    except subprocess.TimeoutExpired as exc:
        rc, out = -9, (exc.stdout or "") + f"\nTIMEOUT after {timeout}s"
    wall = time.perf_counter() - start
    passed = failed = skipped = 0
    for line in reversed(out.splitlines()):
        m = _SUMMARY_RE.search(line)
        if m and m.group("passed"):
            passed = int(m.group("passed"))
            failed = int(m.group("failed") or 0) + int(m.group("errors") or 0)
            skipped = int(m.group("skipped") or 0)
            break
    # rc 5 = "no tests collected" (e.g. all deselected by -m): not a failure.
    ok = rc in (0, 5)
    return {
        "module": module.name, "ok": ok, "rc": rc, "passed": passed,
        "failed": failed, "skipped": skipped, "wall": wall, "output": out,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--marker", default="",
                    help="pytest -m expression (e.g. 'not slow')")
    ap.add_argument("-j", "--jobs", type=int, default=1,
                    help="modules run concurrently (2 fits this host)")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-module wall budget in seconds")
    ap.add_argument("-k", default="", help="pytest -k expression")
    args = ap.parse_args()

    extra = []
    if args.marker:
        extra += ["-m", args.marker]
    if args.k:
        extra += ["-k", args.k]

    modules = sorted(TESTS_DIR.glob("test_*.py"))
    results = []
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=args.jobs) as pool:
        futs = {pool.submit(run_module, m, extra, args.timeout): m
                for m in modules}
        for fut in cf.as_completed(futs):
            r = fut.result()
            results.append(r)
            status = "ok " if r["ok"] else "FAIL"
            print(f"[{status}] {r['module']:<40} "
                  f"{r['passed']:>3} passed {r['failed']:>2} failed "
                  f"{r['skipped']:>2} skipped  {r['wall']:6.1f}s", flush=True)
            if not r["ok"]:
                tail = "\n".join(r["output"].splitlines()[-30:])
                print(f"--- {r['module']} output tail ---\n{tail}\n---",
                      flush=True)

    total_pass = sum(r["passed"] for r in results)
    total_fail = sum(r["failed"] for r in results)
    total_skip = sum(r["skipped"] for r in results)
    bad = [r["module"] for r in results if not r["ok"]]
    wall = time.perf_counter() - t0
    verdict = "GREEN" if not bad else f"RED ({', '.join(sorted(bad))})"
    print(f"\n=== suite {verdict}: {total_pass} passed, {total_fail} failed, "
          f"{total_skip} skipped across {len(results)} modules "
          f"in {wall / 60:.1f} min ===")
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
