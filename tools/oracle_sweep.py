#!/usr/bin/env python
"""Driver-style oracle sweep: run EVERY oracle-backed entry of
__ray_entry__.queries() against its oracle_sql() twin on one sf-dir and
report rows/schema/value-hash matches — the same compare shape the
correctness driver applies (columns sorted by name, floats rounded to 9dp,
oracle frame cast to the Ray frame's dtypes before hashing).

Usage: python tools/oracle_sweep.py [SF_DIR] [--only name1,name2]
Owns its Ray session (allowed: bench.py, CLI entry points, test fixture,
and this tool).
"""
import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in list(df.columns):  # list columns can't hash; driver drops them
        if df[c].dtype == object and len(df) and isinstance(
            df[c].iloc[0], (list, np.ndarray)
        ):
            df = df.drop(columns=[c])
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def vhash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            h.update(np.round(col.to_numpy(np.float64), 9).tobytes())
        else:
            h.update(pd.util.hash_pandas_object(col, index=False).to_numpy().tobytes())
    return h.hexdigest()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    ray.init(address="local", include_dashboard=False)
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, osql = entry.queries(), entry.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if name not in osql or (only and name not in only):
            continue
        t0 = time.time()
        try:
            r = fn(sf)
            df = r.to_pandas() if hasattr(r, "to_pandas") else pd.DataFrame(r)
            a = canon(df.copy())
            b = canon(con.sql(osql[name]).df())
            ok = (
                len(a) == len(b)
                and list(a.columns) == list(b.columns)
                and vhash(a) == vhash(canon(b.astype(a.dtypes.to_dict())))
            )
            stat = {"rows": len(a), "oracle_rows": len(b), "sec": round(time.time() - t0, 2)}
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            ok, stat = False, {"err": str(ex)[:200]}
        print(("PASS" if ok else "FAIL"), name, json.dumps(stat), flush=True)
        if not ok:
            bad.append(name)
    print("TOTAL", len([n for n in qs if n in osql and (not only or n in only)]),
          "FAILING", len(bad), bad)
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
