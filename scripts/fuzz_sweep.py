#!/usr/bin/env python
"""Full-registry oracle sweep on a GENERATED adversarial schema dir.

Composes the four pytest fuzz generators (TPC-H miniature with planted
tie/correlation traps, tie-dense events, documents with planted
duplicate structure, embeddings with planted duplicate vectors) into
ONE complete sf-dir, then runs the driver-replica preflight over the
whole registry against it — i.e. every oracle-mapped query must agree
with DuckDB not just on the fixed testdata but on an adversarial corpus
none of the code has ever seen.

Usage:
    python scripts/fuzz_sweep.py [seed] [names...]
Exits non-zero on any strict-compare failure (same contract as
scripts/preflight.py, which it delegates to).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_composite_dir(seed: int, dst: str) -> None:
    from tests.test_fuzz_oracle import (
        _write_docs_fuzz,
        _write_emb_fuzz,
        _write_events_fuzz,
    )
    from tests.test_sql_analytics import _write_fuzz_sf

    stage = tempfile.mkdtemp(prefix="bdts-fuzz-stage-")
    tpch = _write_fuzz_sf(stage, seed)
    # start from the TPC-H miniature (generated supplier/part/orders/
    # lineitem + static region/nation/customer), then overlay each
    # family's generated table
    for f in os.listdir(tpch):
        shutil.copy(os.path.join(tpch, f), os.path.join(dst, f))
    for gen, table in (
        (_write_events_fuzz, "events"),
        (_write_docs_fuzz, "documents"),
        (_write_emb_fuzz, "embeddings"),
    ):
        d = gen(stage, seed)
        shutil.copy(
            os.path.join(d, f"{table}.parquet"),
            os.path.join(dst, f"{table}.parquet"),
        )
    shutil.rmtree(stage, ignore_errors=True)


def main() -> int:
    args = sys.argv[1:]
    seed = int(args[0]) if args and args[0].isdigit() else 0
    names = args[1:] if args and args[0].isdigit() else args
    dst = tempfile.mkdtemp(prefix=f"bdts-fuzz-sf-s{seed}-")
    build_composite_dir(seed, dst)
    print(f"composite fuzz dir (seed {seed}): {dst}")
    rc = subprocess.call(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "preflight.py"),
            "--sf-dir",
            dst,
            *names,
        ]
    )
    shutil.rmtree(dst, ignore_errors=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
