"""Simulate the spark-graft driver gate: entry() smoke + queries() vs
oracle_sql() on DuckDB at sf0.01, order-insensitive value-hash compare."""
import hashlib
import json
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _hash_rows(cols, rows):
    cols = list(cols)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def _norm(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (bytes, bytearray)):
        return hashlib.md5(bytes(v)).hexdigest()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def main():
    import duckdb
    import __spark_entry__ as e
    from abwcf_spark.session import get_spark

    spark = get_spark()
    df = e.entry(spark)
    n = len(df.collect())
    print(f"entry: {n} rows", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    only = sys.argv[1:]
    ok = bad = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            if name not in oracles:
                print(f"  {name}: rows-only {len(srows)} (no oracle)")
                ok += 1
                continue
            ores = con.execute(oracles[name]).fetchall()
            ocols = [d[0] for d in con.description]
            rows_m = len(srows) == len(ores)
            schema_m = sorted(scols) == sorted(ocols)
            hash_m = _hash_rows(scols, srows) == _hash_rows(ocols, ores)
            tag = "OK " if (rows_m and schema_m and hash_m) else "BAD"
            if tag == "OK ":
                ok += 1
            else:
                bad += 1
            print(
                f"  {tag} {name}: rows {len(srows)}/{len(ores)} "
                f"schema={schema_m} hash={hash_m}",
                flush=True,
            )
            if tag == "BAD" and not schema_m:
                print(f"       spark cols: {sorted(scols)}")
                print(f"       oracle cols: {sorted(ocols)}")
        except Exception as ex:
            bad += 1
            print(f"  ERR {name}: {type(ex).__name__}: {ex}", flush=True)
    print(f"RESULT ok={ok} bad={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
