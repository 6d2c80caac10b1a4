#!/usr/bin/env python3
"""Arrow-schema audit of every DuckDB oracle vs its Spark result
(VERDICT r2 #1: the pack_sequences HUGEINT leak was invisible to
stringified-value comparison — audit by ARROW RESULT SCHEMA, since the
driver's hash compare is typed).

Usage: python3 scripts/audit_oracle_schemas.py <sfDir> <verifyOutDir>

For each entry in <verifyOutDir>/oracle_sql.json:
  - run the SQL in DuckDB and take its .arrow() schema
  - read the Spark parquet's arrow schema
  - compare per-column arrow types (name-sorted, the driver's order)
Flags any divergence, with special attention to decimal128 (DuckDB
HUGEINT sums), int32-vs-int64 and large_string-vs-string (benign).

Exit code 1 iff any NON-benign mismatch is found.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq


def canon(t):
    """Canonical arrow type name; string width variants are benign."""
    s = str(t)
    if s in ("large_string", "string", "utf8", "large_utf8"):
        return "string"
    if s.startswith("large_list") or s.startswith("list"):
        return "list<" + canon(t.value_type) + ">"
    return s


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name:28s} SKIP (no spark parquet)")
            continue
        try:
            dd = con.execute(oracle[name]).arrow().schema
        except Exception as e:
            print(f"{name:28s} ORACLE ERROR: {e}")
            bad += 1
            continue
        sp = pq.read_schema(files[0])
        ddm = {f.name: f.type for f in dd}
        spm = {f.name: f.type for f in sp}
        if sorted(ddm) != sorted(spm):
            print(f"{name:28s} COLUMN-SET MISMATCH duck={sorted(ddm)} spark={sorted(spm)}")
            bad += 1
            continue
        diffs = []
        for c in sorted(ddm):
            cd, cs = canon(ddm[c]), canon(spm[c])
            if cd != cs:
                diffs.append(f"{c}: duck={cd} spark={cs}")
        if diffs:
            print(f"{name:28s} TYPE MISMATCH  " + "; ".join(diffs))
            bad += 1
        else:
            print(f"{name:28s} OK")
    print(f"\n{'FAIL' if bad else 'PASS'}: {bad} mismatching entries")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
