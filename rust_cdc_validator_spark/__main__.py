"""CLI driver mirroring the reference's `validate` command surface
(dms-cdc-operator-client/src/main.rs:110-155 clap args; flag gating at
:345-373). One command, two phases: snapshot (CDC replay) then validate
(diff), gated by --only-snapshot / --only-datadiff.

The catalog comes from a JSON file (StaticCatalog shape) or a JDBC URL:

    {"public": {"customers": {"columns": {"id": "bigint", ...},
                              "primary_key": ["id"]}}}

Usage:
    python -m rust_cdc_validator_spark \
        --bucket-root file:///data/cdc --database db --schema public \
        --catalog-json catalog.json --start-date 2024-01-01 \
        --output /tmp/snapshots [--only-snapshot | --only-datadiff] \
        [--chunk-size 1000] [--start-position 0] \
        [--included-tables t1 t2] [--excluded-tables t3] \
        [--mode date_aware|full_load_only]
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import datetime, timezone

from rust_cdc_validator_spark.api import CdcPayload, CdcValidator
from rust_cdc_validator_spark.session import get_spark
from rust_cdc_validator_spark.sources.catalog import StaticCatalog
from rust_cdc_validator_spark.sources.manifest import FileMode


def _load_catalog(path: str) -> StaticCatalog:
    with open(path) as f:
        raw = json.load(f)
    tables = {
        schema: {
            t: (spec["columns"], spec.get("primary_key", []))
            for t, spec in ts.items()
        }
        for schema, ts in raw.items()
    }
    return StaticCatalog(tables)


def _parse_date(s: str | None) -> datetime | None:
    if not s:
        return None
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rust_cdc_validator_spark")
    p.add_argument("--interactive", action="store_true",
                   help="prompt for any value not given as a flag "
                        "(the reference client's inquire flow)")
    p.add_argument("--bucket-root")
    p.add_argument("--database")
    p.add_argument("--schema")
    p.add_argument("--catalog-json")
    p.add_argument("--output", help="dir for snapshot parquet")
    p.add_argument("--mode", choices=[m.value for m in FileMode],
                   default=FileMode.DATE_AWARE.value)
    p.add_argument("--start-date")
    p.add_argument("--stop-date")
    p.add_argument("--absolute-path", help="single parquet file (absolute_path mode)")
    p.add_argument("--included-tables", nargs="*", default=[])
    p.add_argument("--excluded-tables", nargs="*", default=[])
    # reference CLI defaults: main.rs:75-83
    p.add_argument("--chunk-size", type=int, default=1000)
    p.add_argument("--start-position", type=int, default=0)
    p.add_argument("--only-snapshot", action="store_true")
    p.add_argument("--only-datadiff", action="store_true")
    p.add_argument("--source-root", help="parquet dir of source tables for validate")
    p.add_argument(
        "--advance-state", nargs=2, metavar=("STATE_TABLE", "NEW_STATE_TABLE"),
        help="incremental mode (extension): apply only the window's CDC "
             "files to the bucketed STATE_TABLE, writing NEW_STATE_TABLE "
             "(one table — use --included-tables with exactly one name); "
             "the applied window is stamped on the new table",
    )
    return p


_REQUIRED = ["bucket_root", "database", "schema", "catalog_json", "output"]


def _prompt_missing(args, input_fn=input) -> None:
    """Interactive prompt flow mirroring the reference client's inquire
    prompts (dms-cdc-operator-client/src/main.rs:157-285): each value not
    already given as a flag is asked for on stdin; empty input keeps the
    default (required values re-prompt)."""

    def ask(label, default=None, required=False, cast=lambda s: s):
        while True:
            suffix = f" [{default}]" if default not in (None, "", []) else ""
            raw = input_fn(f"{label}{suffix}: ").strip()
            if not raw:
                if required and default in (None, ""):
                    print("  value required", file=sys.stderr)
                    continue
                return default
            return cast(raw)

    args.bucket_root = args.bucket_root or ask(
        "bucket root (file:///... or s3a://...)", required=True)
    args.database = args.database or ask("database name", required=True)
    args.schema = args.schema or ask("schema name", required=True)
    args.catalog_json = args.catalog_json or ask("catalog JSON path", required=True)
    args.output = args.output or ask("snapshot output dir", required=True)
    args.mode = ask("mode", default=args.mode)
    if FileMode(args.mode) is FileMode.DATE_AWARE and not args.start_date:
        args.start_date = ask("start date (ISO)", required=True)
        args.stop_date = args.stop_date or ask("stop date (ISO, empty = none)")
    if not args.included_tables:
        raw = ask("included tables (space-separated, empty = all)")
        args.included_tables = raw.split() if raw else []
    args.chunk_size = ask("chunk size", default=args.chunk_size, cast=int)
    args.start_position = ask("start position", default=args.start_position, cast=int)


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.interactive:
        _prompt_missing(args)
    required = [
        k for k in _REQUIRED
        # advance-state writes a TABLE version, not parquet under --output
        if not (args.advance_state and k == "output")
    ]
    missing = [k for k in required if not getattr(args, k)]
    if missing:
        parser.error(
            "missing required arguments: "
            + ", ".join("--" + m.replace("_", "-") for m in missing)
            + " (or use --interactive)"
        )
    payload = CdcPayload(
        bucket_root=args.bucket_root,
        database=args.database,
        schema=args.schema,
        included_tables=args.included_tables,
        excluded_tables=args.excluded_tables,
        mode=FileMode(args.mode),
        start_date=_parse_date(args.start_date),
        stop_date=_parse_date(args.stop_date),
        absolute_path=args.absolute_path,
        chunk_size=args.chunk_size,
        start_position=args.start_position,
        only_datadiff=args.only_datadiff,
        only_snapshot=args.only_snapshot,
    )
    spark = get_spark("cdc-validator-cli")
    validator = CdcValidator(spark, _load_catalog(args.catalog_json))

    if args.advance_state:
        if len(args.included_tables) != 1:
            parser.error("--advance-state requires exactly one --included-tables name")
        state_table, new_state_table = args.advance_state
        table = args.included_tables[0]
        df = validator.advance_state(payload, table, state_table, new_state_table)
        win = validator.state_window(new_state_table)
        print(
            f"advance {table}: {df.count()} rows -> {new_state_table} "
            f"window={win.get('start')}..{win.get('stop')}"
        )
        return 0

    snapshots = {}
    if not payload.only_datadiff:
        snapshots = validator.snapshot(payload)
        for table, df in snapshots.items():
            out = f"{args.output}/{table}"
            df.write.mode("overwrite").parquet(out)
            print(f"snapshot {table}: {spark.read.parquet(out).count()} rows -> {out}")
    if payload.only_snapshot:
        return 0

    if not args.source_root:
        print("validate skipped: --source-root not given", file=sys.stderr)
        return 0
    sources = {
        t: spark.read.parquet(f"{args.source_root}/{t}")
        for t in validator._tables(payload)
    }
    targets = snapshots or {
        t: spark.read.parquet(f"{args.output}/{t}") for t in sources
    }
    reports = validator.validate(payload, sources, targets)
    ok = True
    for t, rep in reports.items():
        status = "MATCH" if rep.is_match else "MISMATCH"
        print(
            f"validate {t}: {status} counts={rep.source_count}/{rep.target_count} "
            f"bad_chunks={rep.mismatched_chunks}"
        )
        ok &= rep.is_match
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
