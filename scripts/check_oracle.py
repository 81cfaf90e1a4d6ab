"""Local replica of the driver's correctness gate.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.001"
    only = set(args)

    import __spark_entry__ as e
    from apmbackend_spark.session import get_spark
    from apmbackend_spark.testing import compare_query

    spark = get_spark("oracle-check")
    oracles = e.oracle_sql()
    failed = []
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        try:
            ok, msg = compare_query(spark, sf_dir, fn, oracles.get(name))
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {ex}"
        print(f"{name}: {msg}")
        if not ok:
            failed.append(name)
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all OK")


if __name__ == "__main__":
    main()
