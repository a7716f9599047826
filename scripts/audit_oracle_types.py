#!/usr/bin/env python3
"""Oracle output-representation audit (round-8 gate addition).

The two driver-red rows of rounds 6-7 (q235, q263) shared one fingerprint:
oracle SQL whose output columns were DuckDB HUGEINT (int128) because a
sum()/list_sum() propagated through arithmetic uncast, while the Spark
side emits int64. A representation-sensitive comparator (arrow/pandas
int128-vs-int64 conversion) flags exactly those rows while rows/schema
stay green. House rule: every oracle output column must be CAST to one of
the portable types below. This script DESCRIBEs every oracle query and
fails loudly on any column outside the whitelist, so the class can never
recur. Run it as part of the local gate after graft.Verify:

    python3 scripts/audit_oracle_types.py <sfDir> <verifyOutDir>

It also cross-checks the Spark parquet output schema (when present) for
a type-category mismatch (e.g. oracle DOUBLE vs spark BIGINT).
(Dev tool only — the product library has no Python dependency.)
"""
import json
import re
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Portable scalar types the house cast rule allows in oracle output.
# Arrays of those scalars are allowed too (list-valued evidence columns).
ALLOWED = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}
ALLOWED_RE = re.compile(
    r"^(" + "|".join(ALLOWED) + r")(\[\])?$")

# Category map for the oracle-vs-spark cross check.
CATEGORY = {
    "BIGINT": "int", "INTEGER": "int", "SMALLINT": "int", "TINYINT": "int",
    "HUGEINT": "int128", "UBIGINT": "int", "DOUBLE": "float",
    "FLOAT": "float", "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "TIMESTAMP_NS": "ts",
}


def connect(sf_dir):
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_swap'")
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
        if t == "events":
            (ts_type,) = [r[1] for r in con.execute(
                "DESCRIBE events").fetchall() if r[0] == "ts"]
            if ts_type == "BIGINT":
                con.execute(
                    "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) "
                    f"FROM read_parquet('{src}')")
    return con


def spark_types(con, spark_dir):
    try:
        rows = con.execute(
            f"DESCRIBE SELECT * FROM "
            f"read_parquet('{spark_dir}/*.parquet')").fetchall()
        return {r[0]: r[1] for r in rows}
    except Exception:
        return None


def main(sf_dir, out_dir):
    con = connect(sf_dir)
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    bad = []
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            bad.append((name, f"DESCRIBE failed: {e}"))
            continue
        otypes = {r[0]: r[1] for r in desc}
        for col, typ in otypes.items():
            if not ALLOWED_RE.match(typ):
                bad.append((name, f"column {col} has non-portable oracle "
                                  f"type {typ} (allowed: {sorted(ALLOWED)}"
                                  f" + their [] lists)"))
        st = spark_types(con, Path(out_dir, name))
        if st is not None:
            for col, typ in otypes.items():
                s = st.get(col)
                if s is None:
                    continue  # column-set diffs are check_oracle's job
                oc = CATEGORY.get(typ.replace("[]", ""), typ)
                sc = CATEGORY.get(s.replace("[]", ""), s)
                if oc != sc:
                    bad.append((name, f"column {col}: oracle {typ} vs "
                                      f"spark parquet {s}"))
    if bad:
        for name, msg in bad:
            print(f"FAIL {name}: {msg}")
        print(f"\n{len(bad)} violations across "
              f"{len(set(n for n, _ in bad))} queries "
              f"({len(oracle)} audited)")
        return 1
    print(f"OK: all {len(oracle)} oracle queries emit only portable "
          f"output types {sorted(ALLOWED)}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
