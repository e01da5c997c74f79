"""Dump .explain("formatted") for declared queries / bench frames.

Usage:
  python tools/dump_plans.py <outdir> [name ...]

Writes <outdir>/<name>.txt for each requested registry entry (default:
every declared driver-window query).  Building an index-backed entry's
frame executes its ingest side effects (scratch dirs), exactly as the
driver does; the dumped plan is the RETURNED query frame — the part a
reader executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)

    from tiledb_vector_search_spark import get_spark
    from tiledb_vector_search_spark.queries import FULL_REGISTRY

    spark = get_spark(app_name="tvs-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if not names:
        names = list(FULL_REGISTRY)
    for name in names:
        try:
            import contextlib
            import io

            df = FULL_REGISTRY[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # record the failure, keep sweeping
            plan = f"ERROR building {name}: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"dumped {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
