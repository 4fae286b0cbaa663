"""CLI for the engine — the usability surface the reference binary offers
(compile → run over a data dir → inspect output, reference README.md usage)
re-expressed as subcommands over the query registry:

    python -m mapreduce_paradigm_spark list [--tag dedup]
    python -m mapreduce_paradigm_spark run <query> [--sf-dir D] [--limit N]
                                         [--output PATH] [--format parquet]
    python -m mapreduce_paradigm_spark explain <query> [--sf-dir D]
    python -m mapreduce_paradigm_spark oracle <query>   # print the DuckDB SQL
    python -m mapreduce_paradigm_spark verify <query> [--sf-dir D]  # oracle gate

``run`` prints the result (or writes it with ``--output``); ``explain``
prints the formatted physical plan — the same feedback loop the plan-pin
tests automate. Exit status is non-zero on unknown queries so the CLI is
scriptable.
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mapreduce_paradigm_spark",
        description="Run registered queries of the PySpark analytics engine.",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("--tag", help="filter by tag (e.g. dedup, streaming)")
    lp.add_argument("--bench", action="store_true", help="only bench-set queries")

    for name in ("run", "explain", "oracle", "verify"):
        cp = sub.add_parser(name)
        cp.add_argument("query", help="registered query name")
        if name != "oracle":
            cp.add_argument(
                "--sf-dir",
                default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
            )
        if name == "run":
            cp.add_argument("--limit", type=int, default=20, help="rows to print")
            cp.add_argument("--output", help="write full result here instead")
            cp.add_argument(
                "--format", default="parquet", choices=("parquet", "csv", "json", "orc")
            )
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from mapreduce_paradigm_spark.registry import all_specs

    specs = all_specs()

    if args.cmd == "list":
        for name, spec in sorted(specs.items()):
            if args.tag and args.tag not in spec.tags:
                continue
            if args.bench and not spec.bench:
                continue
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t[{oracle}]\t{', '.join(spec.tags)}")
        return 0

    spec = specs.get(args.query)
    if spec is None:
        close = [n for n in specs if args.query in n]
        print(f"unknown query: {args.query}", file=sys.stderr)
        if close:
            print(f"did you mean: {', '.join(sorted(close)[:5])}", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        if spec.oracle is None:
            print("-- rows-only query: no SQL oracle (see its pytest pins)")
            return 0
        print(spec.oracle)
        return 0

    from mapreduce_paradigm_spark.session import get_spark

    spark = get_spark(app_name=f"mps-cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    df = spec.builder(spark, args.sf_dir)

    if args.cmd == "explain":
        from mapreduce_paradigm_spark.plans import formatted_plan

        print(formatted_plan(df))
        return 0

    if args.cmd == "verify":
        from mapreduce_paradigm_spark.oracle import compare_query

        result = compare_query(spark, args.query, args.sf_dir)
        print(("PASS" if result.ok else "FAIL"), args.query, "—", result.detail)
        return 0 if result.ok else 1

    if args.output:
        df.write.format(args.format).mode("overwrite").save(args.output)
        print(f"wrote {args.output} ({args.format})")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
