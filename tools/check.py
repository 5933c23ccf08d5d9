#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01

For each <name> dir under outDir: load the Spark parquet result, run the
matching oracle SQL from oracle_sql.json in DuckDB over the sf tables,
sort columns by name + rows by all columns, and compare cell-by-cell
(exact; floats must be bit-equal after float64 round-trip).

The comparison is TYPE-AWARE, like the driver's hash: for each column
(sorted by name) the DuckDB-reported type of the Spark parquet result must
match the oracle relation's type UP TO the driver's value-representation
equivalence. Empirically (CORRECTNESS_r03 vs the raw types): the driver
accepts INTEGER-vs-BIGINT and DECIMAL-vs-DOUBLE (both collapse to the same
value repr when materialized), but rejects HUGEINT-vs-BIGINT (DuckDB's
uncast sum(INT) is INT128, which materializes as float64 — "3.0" vs "3").
So types compare by EQUIVALENCE CLASS: {TINYINT..BIGINT} is one class,
{DECIMAL(p,s), DOUBLE} one class, everything else (HUGEINT included —
Spark can never produce it) compares exactly. This catches the
uncast-integer-sum bug that a stringified-cell compare silently erases,
without flagging differences the driver provably accepts.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(str(v) for v in r))
    out.sort()
    return out

def tclass(t):
    """Driver-hash equivalence class of a DuckDB type (see module doc)."""
    s = str(t).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "INT"
    if s == "DOUBLE" or s.startswith("DECIMAL"):
        return "FLOAT64"
    return s  # HUGEINT, FLOAT, VARCHAR, BOOLEAN, TIMESTAMP...: exact

def type_mismatches(got_rel, exp_rel):
    """Pairs (col, got_type, exp_type) whose types differ BY CLASS.

    Both relations live in the same DuckDB session, so type names are
    directly comparable. This is what makes an uncast integer sum
    (HUGEINT) visible against Spark's BIGINT.
    """
    got_t = {c: str(t) for c, t in zip(got_rel.columns, got_rel.types)}
    exp_t = {c.lower(): str(t) for c, t in zip(exp_rel.columns, exp_rel.types)}
    bad = []
    for c, gt in sorted(got_t.items()):
        et = exp_t.get(c.lower())
        if et is not None and tclass(gt) != tclass(et):
            bad.append((c, gt, et))
    return bad

# hex52 of md5('abc') exactly as operators/Sketch.hex52Sql generates it
# — the portable 52-bit hash every sketch/sampling oracle leans on
_HEX52_ABC = "(" + " + ".join(
    "CAST(instr('0123456789abcdef', substring(md5('abc'), %d, 1)) - 1 "
    "AS BIGINT) * %d" % (i + 1, 1 << (4 * (12 - i))) for i in range(13)) + ")"

# Oracle-environment tripwire: semantic probes over every DuckDB
# behavior the oracle SQL corpus leans on — md5, the hex52 nibble fold,
# // and % sign semantics, round-half behavior, regexp_split_to_array,
# generate_series bounds, INTERVAL arithmetic, instr indexing, float
# repr through floor, epoch_us, strftime, and the sum(INT)→HUGEINT
# type class the driver hash distinguishes from BIGINT. Goldens pinned
# under DuckDB 1.0.0; a driver-side DuckDB upgrade that changes ANY of
# them would silently flip query hashes, so drift here must fail the
# whole run loudly BEFORE any query comparison is attempted.
ENV_PROBES = [
    ("SELECT md5('abc')", "[('900150983cd24fb0d6963f7d28e17f72',)]"),
    ("SELECT " + _HEX52_ABC, "[(2533365144341796,)]"),
    ("SELECT 7 // 2, -7 // 2, 7 % 3, -7 % 3", "[(3, -3, 1, -1)]"),
    ("SELECT CAST(round(2.5) AS VARCHAR), CAST(round(3.5) AS VARCHAR),"
     " CAST(round(-2.5) AS VARCHAR)", "[('3', '4', '-3')]"),
    (r"SELECT len(regexp_split_to_array(lower(trim(' A  b ')), '\s+'))",
     "[(2,)]"),
    ("SELECT count(*) FROM (SELECT unnest(generate_series(1, 3)))",
     "[(3,)]"),
    ("SELECT CAST(TIMESTAMP '1995-01-01' + INTERVAL 30 DAY AS VARCHAR)",
     "[('1995-01-31 00:00:00',)]"),
    ("SELECT instr('0123456789abcdef', 'a')", "[(11,)]"),
    ("SELECT CAST(floor(2.675 * 100) AS BIGINT)", "[(267,)]"),
    ("SELECT epoch_us(TIMESTAMP '1970-01-02 00:00:00')",
     "[(86400000000,)]"),
    ("SELECT strftime(TIMESTAMP '2024-03-01', '%Y-%m-%d')",
     "[('2024-03-01',)]"),
]

def probe_oracle_env(con):
    """Die (exit 2) on oracle-environment drift; returns quietly if sane."""
    bad = []
    for sql, want in ENV_PROBES:
        try:
            got = repr(con.sql(sql).fetchall())
        except Exception as e:  # a removed function is drift too
            got = f"ERROR: {e}"
        if got != want:
            bad.append((sql, want, got))
    tcls = [tclass(t) for t in
            con.sql("SELECT sum(i), avg(i) FROM range(3) t(i)").types]
    if tcls != ["HUGEINT", "FLOAT64"]:
        bad.append(("typeof sum(INT), avg(INT)",
                    "['HUGEINT', 'FLOAT64']", repr(tcls)))
    if bad:
        print(f"ORACLE ENV DRIFT (duckdb {duckdb.__version__}): "
              f"{len(bad)} probe(s) changed — query hashes are not "
              f"comparable, refusing to grade")
        for sql, want, got in bad:
            print(f"  probe: {sql}\n    want {want}\n    got  {got}")
        sys.exit(2)

def main(out_dir, sf_dir):
    con = duckdb.connect()
    probe_oracle_env(con)
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        got_rel = con.sql(f"SELECT * FROM '{d}*.parquet'")
        if name not in oracle:
            print(f"SKIP  {name} (rows-only: {len(got_rel.fetchall())} rows)")
            n_skip += 1
            continue
        # the driver's gate hashes cells through pandas sort_values, which
        # dies on non-scalar cells (TypeError: unhashable numpy.ndarray) —
        # reject array/struct/map output columns HERE before the driver does
        nested = [(c, str(t)) for c, t in zip(got_rel.columns, got_rel.types)
                  if "[]" in str(t) or str(t).upper().startswith(("STRUCT", "MAP", "LIST"))]
        if nested:
            n_fail += 1
            print(f"FAIL  {name}: non-scalar output column(s) — the driver "
                  f"gate cannot hash these; scalarize (array_to_string/md5)")
            for c, t in nested:
                print(f"      {c}: {t}")
            continue
        exp_rel = con.sql(oracle[name])
        g_cols = sorted(got_rel.columns)
        e_cols = sorted(exp_rel.columns)
        if [c.lower() for c in g_cols] != [c.lower() for c in e_cols]:
            print(f"FAIL  {name}: columns {g_cols} vs {e_cols}")
            n_fail += 1
            continue
        bad_types = type_mismatches(got_rel, exp_rel)
        if bad_types:
            n_fail += 1
            print(f"FAIL  {name}: column type mismatch")
            for c, gt, et in bad_types:
                print(f"      {c}: spark={gt} oracle={et}")
            continue
        got = norm(got_rel.select(", ".join(f'"{c}"' for c in g_cols)).fetchall())
        exp = norm(exp_rel.select(", ".join(f'"{c}"' for c in e_cols)).fetchall())
        if got == exp:
            print(f"PASS  {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL  {name}: {len(got)} vs {len(exp)} rows")
            diff = [(a, b) for a, b in zip(got, exp) if a != b][:3]
            for a, b in diff:
                print(f"      got {a}\n      exp {b}")
            if len(got) != len(exp):
                only_g = set(got) - set(exp)
                only_e = set(exp) - set(got)
                for r in list(only_g)[:3]: print(f"      extra   {r}")
                for r in list(only_e)[:3]: print(f"      missing {r}")
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
