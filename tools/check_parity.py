"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and an order-insensitive value multiset (columns sorted
by name, doubles rounded to 9 significant-ish decimals, rows sorted).

Usage: python tools/check_parity.py [--json=PATH] [sf_dir] [query ...]

A FULL-registry run (no query filter) at the default sf_dir writes
PARITY.json automatically — the committed evidence file MUST track the
registry (tests/test_golden_registry.py pins the sync), and round 5
showed a full run without ``--json=`` silently leaving a stale file.
``--json=PATH`` overrides the destination; targeted runs (explicit
query names or a non-default sf_dir) never write unless asked.
"""

from __future__ import annotations

import decimal
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from batch_processing_on_aws_spark.schemas import TABLE_NAMES
from batch_processing_on_aws_spark.session import get_spark

import __spark_entry__ as entrymod


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f", round(v, 9))
    if isinstance(v, decimal.Decimal):
        # Keep decimals distinct from floats and preserve their scale:
        # the driver's value hash is representation-sensitive, so
        # Decimal('41425.50') on one engine vs 41425.5 on the other is
        # a real failure this gate must reproduce, not paper over.
        return ("d", str(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def _value_hash(norm_rows) -> str:
    return hashlib.sha256(repr(norm_rows).encode()).hexdigest()[:16]


def main() -> int:
    argv = list(sys.argv[1:])
    json_path = None
    merge = "--merge" in argv
    if merge:
        argv.remove("--merge")
    for a in list(argv):
        if a.startswith("--json="):
            json_path = a.split("=", 1)[1]
            argv.remove(a)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if (
        json_path is None
        and (not only or merge)
        and sf_dir == "/root/testdata/sf0.01"
    ):
        json_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PARITY.json",
        )
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    report: dict[str, dict] = {}
    # Registry hygiene gate (round-5 verdict task 7): every query
    # without an oracle must carry a documented rows-only reason —
    # the registry cannot silently grow oracle-less entries.
    from batch_processing_on_aws_spark.plans.golden import rows_only_reasons

    reasons = rows_only_reasons()
    undocumented = sorted(set(qs) - set(oracles) - set(reasons))
    if undocumented:
        print(
            "FAIL registry: rows-only queries without a documented "
            f"reason: {undocumented}"
        )
        failures.append("__registry_rows_only_reasons__")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            report[name] = {"err": f"spark: {e}"[:300]}
            print(f"FAIL {name}: spark error: {e}")
            continue
        extra: dict = {}
        if name == "upsert_events_merge_into":
            # round-5 verdict task 2: the query silently falls back to
            # upsert_frames on catalog-less sessions with identical
            # results, so a green hash alone is path-ambiguous. Assert
            # the DSv2 engine path actually executed and record it.
            from batch_processing_on_aws_spark.plans import golden as _g

            path = _g.MERGE_INTO_EXECUTED_PATH
            if path != "dsv2-merge-into":
                failures.append(name)
                report[name] = {
                    "merge_path": path,
                    "err": (
                        f"executed path {path!r}, expected the DSv2 "
                        "MERGE INTO engine path"
                    ),
                }
                print(f"FAIL {name}: executed path {path!r} (fallback)")
                continue
            extra["merge_path"] = path
        if name not in oracles:
            report[name] = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": len(s_rows),
                "oracle_rows": None,
                "err": None,
                # .get(): an UNDOCUMENTED oracle-less query is already
                # failed by the registry gate above — raising KeyError
                # here would abort the run and lose the report for
                # every remaining query
                "note": "rows-only: " + reasons.get(
                    name, "UNDOCUMENTED (see registry gate failure)"
                ),
            }
            print(f"ok?  {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            report[name] = {"err": f"duckdb: {e}"[:300]}
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        sc, sn = _normalize(s_cols, s_rows)
        dc, dn = _normalize(d_cols, d_rows)
        report[name] = {
            "rows_match": len(s_rows) == len(d_rows),
            "schema_match": sc == dc,
            "hash_match": sc == dc and sn == dn,
            "spark_rows": len(s_rows),
            "oracle_rows": len(d_rows),
            "spark_hash": _value_hash(sn),
            "oracle_hash": _value_hash(dn),
            "secs": round(time.time() - t0, 2),
            "err": None,
            **extra,
        }
        status = []
        if len(s_rows) != len(d_rows):
            status.append(f"rowcount {len(s_rows)} != {len(d_rows)}")
        if sc != dc:
            status.append(f"cols {sc} != {dc}")
        elif sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            status.append(f"values differ, e.g. {diff}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"PASS {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
    if json_path:
        if only and merge and os.path.exists(json_path):
            # --merge: fold the targeted queries into the existing
            # sidecar so adding a registry query doesn't cost a full
            # re-run; entries for queries no longer in the registry
            # are dropped, and the pytest exact-coverage pin still
            # catches queries never run under either path.
            with open(json_path) as fh:
                prev = json.load(fh)
            merged = {
                k: v
                for k, v in prev.get("queries", {}).items()
                if k in qs
            }
            merged.update(report)
            report = merged
        with open(json_path, "w") as fh:
            json.dump({"sf_dir": sf_dir, "queries": report}, fh, indent=1)
        print(f"wrote {json_path} ({len(report)} queries)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
