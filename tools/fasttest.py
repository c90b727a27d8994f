"""Sharded pytest runner: the quick tier in parallel processes.

pytest-xdist is not available in this environment, so this shards the test
FILES across N subprocesses (greedy LPT on line count as the cost proxy),
each with its own JVM sized to cores/N via SPARK_GRAFT_CPUS. File-level
sharding keeps every test file in exactly one process, so session-scoped
fixtures and module state behave exactly as in a serial run.

Usage: python tools/fasttest.py [-n SHARDS] [extra pytest args...]
Exit code is non-zero iff any shard fails; each shard's tail is printed.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    # Accept -n anywhere in argv (e.g. "--runslow -n 8"); everything else is
    # forwarded to pytest verbatim. -n is consumed here because pytest-xdist
    # is absent and a forwarded -n would make pytest error out.
    raw, args, shards = sys.argv[1:], [], 4
    i = 0
    while i < len(raw):
        if raw[i] == "-n":
            if i + 1 >= len(raw):
                print("fasttest: -n requires a shard count", file=sys.stderr)
                return 2
            shards = int(raw[i + 1])
            i += 2
        elif raw[i].startswith("-n") and raw[i][2:].isdigit():
            shards = int(raw[i][2:])
            i += 1
        else:
            args.append(raw[i])
            i += 1
    if shards < 1:
        print("fasttest: shard count must be >= 1", file=sys.stderr)
        return 2
    files = sorted(REPO.glob("tests/test_*.py"))
    weights = [(sum(1 for _ in f.open()), f) for f in files]
    buckets: list[list[Path]] = [[] for _ in range(shards)]
    loads = [0] * shards
    for w, f in sorted(weights, reverse=True):
        i = loads.index(min(loads))
        buckets[i].append(f)
        loads[i] += w
    cpus = max(2, (os.cpu_count() or 8) // shards)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    procs = []
    t0 = time.time()
    for i, bucket in enumerate(buckets):
        if not bucket:
            continue
        log = tempfile.NamedTemporaryFile(
            mode="w+", prefix=f"fasttest{i}_", suffix=".log", delete=False
        )
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", *args, *map(str, bucket)],
            stdout=log,
            stderr=subprocess.STDOUT,
            cwd=REPO,
            env=env,
        )
        procs.append((i, p, log.name))
    failed = 0
    for i, p, log in procs:
        rc = p.wait()
        tail = Path(log).read_text().replace("\r", "\n").splitlines()
        summary = [ln for ln in tail if " passed" in ln or " failed" in ln or "error" in ln]
        print(f"shard {i}: rc={rc} " + (summary[-1] if summary else "(no summary)"))
        if rc != 0:
            failed += 1
            print("\n".join(tail[-30:]))
    print(f"total wall-clock: {time.time() - t0:.1f}s across {len(procs)} shards")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
