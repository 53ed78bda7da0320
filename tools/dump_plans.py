#!/usr/bin/env python
"""Dump .explain("formatted") for registered queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix from PLAN_SUFFIX env,
default the tag's trailing word: 'before' or 'after').

e2e queries execute their sink writes while BUILDING the frame; that is
part of query construction and unavoidable here, but no timed bench runs
alongside this tool.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from amazon_climate_data_etl_spark.session import get_spark  # noqa: E402


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", tag.split("_")[-1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    entry = _load_entry()
    qmap = entry.queries()
    if not names:
        names = list(qmap)
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            df = qmap[name](spark, sf_dir)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001 - record, keep dumping
            text = f"EXPLAIN FAILED: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        spark.catalog.clearCache()
    print(f"wrote {len(names)} plans to {out_dir}")


if __name__ == "__main__":
    main()
