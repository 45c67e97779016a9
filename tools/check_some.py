"""check_oracle for a subset: python tools/check_some.py q1 q2 [--sf DIR]"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

from tools.check_oracle import TABLES, canon, to_pandas


def main(names: list[str], sf_dir: str) -> int:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name in names:
        got = canon(to_pandas(qs[name](sf_dir)))
        if name not in oracles:
            print(f"ok?  {name}: rows={len(got)} (no oracle)")
            continue
        exp = canon(con.execute(oracles[name]).fetchdf())
        ok = list(got.columns) == list(exp.columns) and len(got) == len(exp)
        if ok:
            for c in got.columns:
                a, b = got[c].to_numpy(), exp[c].to_numpy()
                if pd.api.types.is_float_dtype(got[c]) or pd.api.types.is_float_dtype(exp[c]):
                    ok = ok and np.allclose(a.astype(float), b.astype(float),
                                            rtol=1e-6, equal_nan=True)
                else:
                    ok = ok and (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all()
        print(("PASS" if ok else "FAIL"), name, f"rows={len(got)}/{len(exp)}")
        if not ok:
            print("  got cols", list(got.columns), "exp cols", list(exp.columns))
            print(got.head(3), "\n", exp.head(3))
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    sys.exit(main(args, sf))
