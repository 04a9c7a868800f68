"""×N-replica VALUE-equality gate for the documents family.

Clones the sf0.001 documents table N times under fresh ids
(doc_id*16+k — N ≤ 16), which multiplies every shingle's document
frequency by N so the DF_CAP truncation path demonstrably binds
(max base df is 9 at sf0.001, so N ≥ 12 crosses the cap of 100),
then runs tools/compare.py's exact Spark↔DuckDB comparison over
every registered oracle query whose relations touch ONLY the
documents table. This is the replica sweep SCALING.md used to only
wall-clock, upgraded to value equality (r10: 68 pass, 0 fail at
N=12); tests/test_cap_binding.py keeps a fast 6-query core of it in
the pytest suite.

Usage: python tools/replica_gate.py [N] [workdir]
       (defaults: N=12, workdir=/tmp/rds_replica{N})
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_BASE = "/root/testdata/sf0.001"
OTHER_TABLES = (
    "region nation customer supplier part orders lineitem events embeddings"
).split()


def documents_only_queries() -> list[str]:
    from reduction_dask_spark.registry import REGISTRY, load_all_operators

    load_all_operators()
    out = []
    for n, q in REGISTRY.items():
        if not q.oracle:
            continue
        # classify on comment-stripped SQL so a table name in a `--`
        # remark can't silently add/drop a query from the gate
        sql = re.sub(r"--[^\n]*", "", q.oracle)
        if not re.search(r"\bdocuments\b", sql):
            continue
        if any(re.search(rf"\b{t}\b", sql) for t in OTHER_TABLES):
            continue
        out.append(n)
    return sorted(out)


def build_replica_dir(n: int, workdir: str) -> None:
    import pandas as pd

    os.makedirs(workdir, exist_ok=True)
    docs = pd.read_parquet(f"{SF_BASE}/documents.parquet")
    reps = []
    for k in range(n):
        r = docs.copy()
        r["doc_id"] = r["doc_id"] * 16 + k
        reps.append(r)
    pd.concat(reps, ignore_index=True).to_parquet(
        f"{workdir}/documents.parquet", index=False
    )
    # compare.py registers views for every table; the non-document
    # tables are unused by this family but must exist — link them in
    for t in OTHER_TABLES:
        dst = f"{workdir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF_BASE}/{t}.parquet", dst)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    assert 1 <= n <= 16, "doc_id*16+k id scheme supports N<=16"
    workdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/rds_replica{n}"
    build_replica_dir(n, workdir)
    names = documents_only_queries()
    print(f"replica gate: N={n}, {len(names)} documents-only oracle queries")
    from tools.compare import main as compare_main  # type: ignore

    sys.argv = ["compare.py", workdir, *names]
    compare_main()


if __name__ == "__main__":
    main()
