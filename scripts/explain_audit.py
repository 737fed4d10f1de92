"""Explain-plan audit: for each declared query, print scale-relevant
plan facts — pushed filters, read schema width, broadcast vs shuffle
joins, whole-stage-codegen coverage — so regressions in the physical
plan are visible without running the data.

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    import __spark_entry__ as E
    from platypus_ingestion_plugins_spark.session import get_spark

    spark = get_spark("explain-audit")
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf)
        except Exception as exc:  # streaming/stateful entries may need a sink
            print(f"{name}: SKIP ({exc.__class__.__name__})")
            continue
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        plan = buf.getvalue()
        # AQE hides codegen spans until the final plan exists; execute,
        # then read the executed plan (asterisk markers = codegen stages)
        try:
            df.collect()  # executes THIS dataset's own QueryExecution
            plan += df._jdf.queryExecution().executedPlan().toString()
        except Exception:
            pass
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed_n = sum(1 for p in pushed if p.strip())
        scans = len(re.findall(r"Scan parquet", plan))
        bhj = len(re.findall(r"BroadcastHashJoin", plan))
        smj = len(re.findall(r"SortMergeJoin", plan))
        shj = len(re.findall(r"ShuffledHashJoin", plan))
        exchanges = len(re.findall(r"\bExchange\b|\(Exchange", plan))
        codegen = len(set(re.findall(r"\*\((\d+)\)", plan))) or len(
            re.findall(r"WholeStageCodegen", plan)
        )
        pyudf = len(re.findall(r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas", plan))
        wide = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        widths = [len(w.split(",")) for w in wide if w]
        print(
            f"{name}: scans={scans} pushed_filters={pushed_n} "
            f"read_cols={widths} joins[bhj/smj/shj]={bhj}/{smj}/{shj} "
            f"exchanges={exchanges} codegen_spans={codegen} python_udf={pyudf}"
        )


if __name__ == "__main__":
    main()
