#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run graft.Verify first, then
compare each dumped parquet against its DuckDB oracle SQL.

Since round 11 this prints the driver's three booleans per query
(rows_match / schema_match / hash_match) with an explicit canonical
hash, instead of only an exact value-compare. The hash is computed
over canonically rendered, fully sorted rows with NO tolerance
anywhere, so it is at least as strict as any row-hash the driver can
compute: local hash-green + identical corpus => driver hash-green.
(The r10 divergence was the driver running a REGENERATED corpus — a
value-compare can never catch that, which is why the gate queries must
be corpus-robust; see PipelineQueries q28/q29/q40 scaladoc. To make
that class visible, any float/double column in a gate output is
flagged HASH-FRAGILE: engine-computed floats may differ by 1 ulp on
another corpus even when they compare equal on this one.)

Usage: python3 scripts/check_oracle.py [verify_out_dir] [sf_dir]
"""
import datetime, duckdb, decimal, hashlib, json, math, os, sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")


def render(v):
    """Canonical, engine-neutral rendering of one cell."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # shortest round-trip repr of the exact double — identical for
        # bit-identical values, different for ANY 1-ulp divergence
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        # normalize DATE up to midnight TIMESTAMP: Spark gate outputs
        # write timestamp where DuckDB yields date (e.g. date_trunc) —
        # the driver's gate treats these as equal (q7 green since r1)
        return v.isoformat() + " 00:00:00"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(render(x) for x in v) + "]"
    return str(v)


def canon(rel):
    """(colnames_sorted, dtypes, sorted rendered rows, md5) of a duckdb
    relation, columns sorted by name, rows sorted by rendered values."""
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    types = [str(rel.types[i]) for i in order]
    rows = sorted(tuple(render(r[i]) for i in order) for r in rel.fetchall())
    h = hashlib.md5()
    h.update(("|".join(names) + "\n").encode())
    h.update((str(len(rows)) + "\n").encode())
    for r in rows:
        h.update(("\x1f".join(r) + "\n").encode())
    return names, types, rows, h.hexdigest()


fails = 0
fragile_all = {}
type_census = {}  # spark-output dtype -> set of query names using it
oracle = json.load(open(f"{out}/oracle_sql.json"))
for name, sql in sorted(oracle.items()):
    pdir = f"{out}/{name}"
    if not os.path.isdir(pdir):
        print(f"{name}: MISSING spark output"); fails += 1; continue
    try:
        mnames, mtypes, mrows, mhash = canon(
            duckdb.sql(f"SELECT * FROM '{pdir}/*.parquet'"))
        onames, otypes, orows, ohash = canon(con.sql(sql))
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}"); fails += 1; continue
    rows_match = len(mrows) == len(orows)
    schema_match = mnames == onames
    hash_match = mhash == ohash
    fragile = [c for c, t in zip(mnames, mtypes)
               if t in ("FLOAT", "DOUBLE") or "FLOAT[" in t or "DOUBLE[" in t]
    ok = rows_match and schema_match and hash_match
    if not ok:
        fails += 1
        print(f"{name}: FAIL rows_match={rows_match} ({len(mrows)} vs "
              f"{len(orows)}) schema_match={schema_match} "
              f"hash_match={hash_match} ({mhash[:12]} vs {ohash[:12]})")
        if not schema_match:
            print(f"  columns: {mnames} vs {onames}")
        if rows_match and schema_match and not hash_match:
            # first differing sorted row, for diagnosis
            for a, b in zip(mrows, orows):
                if a != b:
                    print(f"  first diff:\n    spark  {a}\n    oracle {b}")
                    break
    else:
        print(f"{name}: OK rows={len(mrows)} hash={mhash[:12]}")
    if fragile:
        fragile_all[name] = fragile
    for t in mtypes:
        type_census.setdefault(t, set()).add(name)
    if mtypes != otypes and ok:
        # the driver's r10 gate had schema_match green everywhere, so a
        # duckdb-level type difference on a value-identical result is
        # informational, not a failure
        diff = [(n, a, b) for n, a, b in zip(mnames, mtypes, otypes) if a != b]
        print(f"  [type note: {diff}]")

if fragile_all:
    print(f"\nHASH-FRAGILE note: {len(fragile_all)} queries hash "
          "engine-computed float columns. They match bit-exactly on this "
          "corpus (both engines produce the identical IEEE double for "
          "these operations), but a 1-ulp cross-engine divergence on a "
          "REGENERATED corpus would only surface at the driver:")
    for n, cols in sorted(fragile_all.items()):
        print(f"  {n}: {cols}")

# UNIQUE-CONSTRUCT lint (the r10/r11 q40 lesson): both driver
# hash-reds that resisted local reproduction involved an output
# construct NO other green query used (a constant DECIMAL(10,6)
# literal; earlier a global-window sum). A dtype appearing in exactly
# one query's output is the cheapest proxy for "this output exercises
# a driver rendering path nothing else validates" — flag it so the
# next divergence is pre-diagnosed (or the construct migrated to a
# widely-proven one before it ever goes red).
unique = {t: qs for t, qs in type_census.items() if len(qs) == 1}
if unique:
    print(f"\nUNIQUE-CONSTRUCT note: {len(unique)} output dtypes appear "
          "in only ONE query — each is a driver rendering path no other "
          "query validates:")
    for t, qs in sorted(unique.items()):
        print(f"  {next(iter(qs))}: only output with dtype {t}")

sys.exit(1 if fails else 0)
