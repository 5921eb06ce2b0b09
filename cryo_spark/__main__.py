"""CLI: ``python -m cryo_spark <command> [opts]``.

Mirrors the reference's command surface (cryo <datasets> [opts],
/root/reference/crates/cli/src/run.rs:9-26 and args
/root/reference/crates/cli/src/args.rs) for the engine's two entry
points plus a decode/export path:

    python -m cryo_spark freeze  --input seqs/ --output out/ [--target-tokens N]
                                 [--overwrite] [--dry-run] [--master local[8]]
    python -m cryo_spark collect --input seqs/|out/ [--columns a,b|all]
                                 [--include-columns x] [--exclude-columns y]
                                 [--sort] [--hex] [--limit N]
                                 [--format csv|json|parquet --output path]

Projection flags follow the reference's include/exclude/columns algebra
(/root/reference/crates/freeze/src/types/schemas.rs:326-356) including
the ``all`` marker; csv/json sinks hex-force binary columns
(/root/reference/crates/cli/src/parse/schemas.rs:37-40).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REMEMBER_FILENAME = "remembered_command.json"


def _split(v: str | None) -> list[str] | None:
    return None if v is None else [s.strip() for s in v.split(",") if s.strip()]


def _parse_filters(items: list[str] | None) -> list[tuple] | None:
    """``col=val`` / ``col>=val`` strings -> (column, op, value) triples."""
    if not items:
        return None
    import re

    out = []
    for s in items:
        m = re.match(
            r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(<=|>=|=|<|>|~)\s*(.+?)\s*$", s)
        if m is None:
            raise SystemExit(f"bad --filter {s!r}; expected col=val, "
                             "col<val, col<=val, col>val, col>=val, or "
                             "col~val (list membership)")
        name, op, raw = m.groups()
        if op == "~":
            op = "contains"
        val: object = raw
        try:
            val = int(raw)
        except ValueError:
            try:
                val = float(raw)
            except ValueError:
                pass
        out.append((name, op, val))
    return out


def _resolve_table(args) -> "TableSpec":  # noqa: F821 (lazy import below)
    """--table resolution: explicit name-or-JSON-path wins; otherwise
    commands that operate on an existing frozen output read the spec the
    freeze persisted there (engine._persist_spec), so users only ever
    state the table family once, at freeze time. Falls back to the
    default sequences family."""
    from cryo_spark.tablespec import SPECS, resolve_spec

    table_arg = getattr(args, "table", None)
    if table_arg is not None:
        return resolve_spec(table_arg)
    if args.cmd != "freeze":
        from cryo_spark.engine import load_output_spec

        # collect reads FROM a (possibly frozen) --input; the rest
        # operate on an existing frozen --output
        probe = (getattr(args, "input", None)
                 if args.cmd in ("collect", "export-shards", "pack")
                 else getattr(args, "output", None))
        if probe:
            spec = load_output_spec(probe)
            if spec is not None:
                return spec
    return SPECS["sequences"]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m cryo_spark")
    sub = ap.add_subparsers(dest="cmd", required=False)

    fz = sub.add_parser("freeze", help="encode with manifest + resume")
    fz.add_argument("--input", required=True)
    fz.add_argument("--output", required=True)
    fz.add_argument("--table", default=None,
                    help="table family: a spec name (tablespec.SPECS) or a "
                         "path to a JSON TableSpec file (default: sequences, "
                         "or the spec persisted in --output)")
    fz.add_argument("--target-tokens", type=int, default=2 << 20)
    fz.add_argument("--keys", default=None,
                    help="key-range spec (reference block grammar: a:b, a:+n, "
                         "a:b:stride, a:b/n, K/M/B suffixes, 'latest')")
    fz.add_argument("--n-chunks", type=int, default=None,
                    help="target this many chunks instead of --target-tokens")
    fz.add_argument("--chunk-by", default="hash",
                    choices=["hash", "range", "zorder"],
                    help="hash buckets (balance-first, default), key-"
                         "range chunks (tight zone maps, exact range "
                         "pruning - the reference's chunk semantics), or "
                         "zorder (Morton interleave of key x weight: zone "
                         "maps prune on either column)")
    fz.add_argument("--partition-by", default=None,
                    help="comma list of encoded-table key columns to "
                         "partition the output directories by")
    fz.add_argument("--branch", default=None,
                    help="commit the run to this snapshot branch "
                         "(invisible on main until publish)")
    fz.add_argument("--align-with", default=None, metavar="OUTPUT",
                    help="reuse that frozen output's chunk plan so keys "
                         "land in the same chunk_ids (enables the zero-"
                         "exchange co-located join)")
    fz.add_argument("--overwrite", action="store_true")
    fz.add_argument("--dry-run", action="store_true")
    fz.add_argument("--master", default=None)
    fz.add_argument("--remember", action="store_true",
                    help="save this command as the directory default "
                         "(reference: crates/cli/src/remember.rs:16-57)")

    cp = sub.add_parser("compact",
                        help="merge undersized chunks of a frozen output")
    cp.add_argument("--output", required=True,
                    help="frozen output dir to compact in place")
    cp.add_argument("--table", default=None,
                    help="table family (see freeze --table)")
    cp.add_argument("--target-tokens", type=int, default=2 << 20)
    cp.add_argument("--min-tokens", type=int, default=None,
                    help="chunks below this are candidates "
                         "(default target/2)")
    cp.add_argument("--max-chunks", type=int, default=1 << 16,
                    help="max chunks rewritten per invocation")
    cp.add_argument("--master", default=None)

    va = sub.add_parser("vacuum",
                        help="delete encoded run dirs with no live chunks "
                             "(space reclaim after compact)")
    va.add_argument("--output", required=True,
                    help="frozen output dir to vacuum in place")
    va.add_argument("--master", default=None)

    og = sub.add_parser("remove-orphans",
                        help="delete run dirs no commit ever claimed "
                             "(Iceberg remove_orphan_files)")
    og.add_argument("--output", required=True)
    og.add_argument("--min-age-s", type=float, default=86_400.0,
                    help="only dirs whose newest file is older than this "
                         "(in-flight-writer guard)")
    og.add_argument("--master", default=None)

    cm = sub.add_parser("consolidate",
                        help="fold per-run manifest dirs into one "
                             "generation (Iceberg rewrite_manifests)")
    cm.add_argument("--output", required=True,
                    help="frozen output dir whose manifests to consolidate")
    cm.add_argument("--master", default=None)

    dl = sub.add_parser("delete",
                        help="row-level delete by predicate (equality-"
                             "delete run + snapshot; merge-on-read)")
    dl.add_argument("--output", required=True)
    dl.add_argument("--table", default=None)
    dl.add_argument("--keys", default=None,
                    help="key-range spec (see freeze --keys)")
    dl.add_argument("--filter", action="append", default=None,
                    help="scalar predicate (see collect --filter)")
    dl.add_argument("--master", default=None)

    vf = sub.add_parser("verify",
                        help="structural audit: manifest vs files vs "
                             "tombstones vs snapshot log (fsck analog)")
    vf.add_argument("--output", required=True)
    vf.add_argument("--master", default=None)

    de = sub.add_parser("describe",
                        help="per-column storage summary (chunks, codec "
                             "histogram, bytes, ratio) from the manifest")
    de.add_argument("--output", required=True)
    de.add_argument("--as-of", default=None, dest="as_of",
                    help="snapshot seq or tag")
    de.add_argument("--master", default=None)

    an = sub.add_parser("analyze",
                        help="per-column NDV statistics via KMV sketches "
                             "(ANALYZE TABLE analog; writes stats/ndv.json)")
    an.add_argument("--output", required=True)
    an.add_argument("--columns", default=None,
                    help="comma-separated subset (default: all)")
    an.add_argument("--k", type=int, default=256)
    an.add_argument("--as-of", default=None, dest="as_of")
    an.add_argument("--master", default=None)

    up = sub.add_parser("upsert",
                        help="MERGE by key: replace matching rows, insert "
                             "the rest (copy-on-write, one snapshot)")
    up.add_argument("--input", required=True,
                    help="parquet batch keyed like the table")
    up.add_argument("--output", required=True)
    up.add_argument("--table", default=None)
    up.add_argument("--target-tokens", type=int, default=2 << 20)
    up.add_argument("--master", default=None)

    br = sub.add_parser("branch",
                        help="create a snapshot branch (write-audit-publish "
                             "isolation; read with --as-of branch:<name>)")
    br.add_argument("--output", required=True)
    br.add_argument("--name", required=True)
    br.add_argument("--seq", type=int, default=None,
                    help="anchor snapshot (default: current head)")

    pub = sub.add_parser("publish",
                         help="fast-forward main to a branch head")
    pub.add_argument("--output", required=True)
    pub.add_argument("--name", required=True)

    tg = sub.add_parser("tag",
                        help="name a snapshot (collect --as-of <name>); "
                             "re-tagging moves it (WAP publish idiom)")
    tg.add_argument("--output", required=True)
    tg.add_argument("--name", required=True)
    tg.add_argument("--seq", type=int, default=None,
                    help="target snapshot (default: latest)")

    pg = sub.add_parser("purge",
                        help="physically apply committed deletes "
                             "(copy-on-write rewrite of affected chunks)")
    pg.add_argument("--output", required=True)
    pg.add_argument("--table", default=None)
    pg.add_argument("--target-tokens", type=int, default=2 << 20)
    pg.add_argument("--master", default=None)

    rb = sub.add_parser("rollback",
                        help="reset current state to snapshot N "
                             "(history stays append-only; see snapshots)")
    rb.add_argument("--output", required=True)
    rb.add_argument("--to", type=int, required=True, dest="to_seq",
                    help="target snapshot sequence number")

    pk = sub.add_parser("pack",
                        help="concat-and-chunk context-window packing; "
                             "freezes the packed_sequences table")
    pk.add_argument("--input", required=True,
                    help="sequences parquet OR a frozen output dir")
    pk.add_argument("--dest", required=True, help="packed output dir")
    pk.add_argument("--window", type=int, default=2048)
    pk.add_argument("--target-tokens", type=int, default=None,
                    dest="target_tokens")
    pk.add_argument("--table", default=None,
                    help="table family of the INPUT (spec name or JSON)")
    pk.add_argument("--keys", default=None)
    pk.add_argument("--as-of", default=None, dest="as_of")
    pk.add_argument("--filter", action="append", default=None)
    pk.add_argument("--master", default=None)

    es = sub.add_parser("export-shards",
                        help="write the corpus as N training shards in a "
                             "reproducible pseudo-random order")
    es.add_argument("--input", required=True,
                    help="sequences parquet OR a frozen output dir")
    es.add_argument("--dest", required=True, help="shard output directory")
    es.add_argument("--n-shards", type=int, default=16, dest="n_shards")
    es.add_argument("--seed", type=int, default=12345)
    es.add_argument("--table", default=None,
                    help="table family: spec name or JSON spec path")
    es.add_argument("--keys", default=None,
                    help="key-range spec (see freeze --keys)")
    es.add_argument("--as-of", default=None, dest="as_of")
    es.add_argument("--filter", action="append", default=None)
    es.add_argument("--master", default=None)

    ie = sub.add_parser("iceberg-export",
                        help="commit a frozen output's encoded files as an "
                             "Iceberg v2 append snapshot (vendored "
                             "metadata.json + Avro manifests)")
    ie.add_argument("--output", required=True, help="frozen output dir")
    ie.add_argument("--location", default=None,
                    help="table location (default <output>/iceberg)")
    ie.add_argument("--partitioned", action="store_true",
                    help="carry the engine partitioning into the table: "
                         "copy-on-write one-partition-per-file data files "
                         "with real manifest partition tuples")
    ie.add_argument("--materialize", action="store_true",
                    help="rewrite visible rows into <location>/data so "
                         "the table owns its files (default export is "
                         "point-in-time over the engine's files)")
    ie.add_argument("--master", default=None)

    isc = sub.add_parser("iceberg-scan",
                         help="plan a scan purely from an Iceberg table's "
                              "metadata chain; prints the file list JSON")
    isc.add_argument("--location", required=True)
    isc.add_argument("--snapshot", type=int, default=None)

    sn = sub.add_parser("snapshots",
                        help="list the output dir's commit history "
                             "(time-travel points for collect --as-of)")
    sn.add_argument("--output", required=True,
                    help="frozen output dir whose snapshot log to list")

    rg = sub.add_parser("register",
                        help="bind a table name to a frozen output in a "
                             "JSON catalog (Iceberg catalog seam)")
    rg.add_argument("--catalog", required=True, help="catalog JSON path")
    rg.add_argument("--name", required=True)
    rg.add_argument("--output", required=True)
    rg.add_argument("--replace", action="store_true")

    tb = sub.add_parser("tables",
                        help="list catalog tables with their "
                             "self-described family + snapshot head")
    tb.add_argument("--catalog", required=True)

    co = sub.add_parser("collect", help="projected dataset to stdout or a sink")
    co.add_argument("--input", required=True,
                    help="sequences parquet OR a frozen output dir (auto-detected)")
    co.add_argument("--table", default=None,
                    help="table family: spec name or JSON spec path")
    co.add_argument("--columns", default=None, help="comma list or 'all'")
    co.add_argument("--keys", default=None, help="key-range spec (see freeze --keys)")
    co.add_argument("--as-of", default=None, dest="as_of",
                    help="read an encoded output at snapshot seq N or "
                         "tag name (see the snapshots / tag commands)")
    co.add_argument("--filter", action="append", default=None,
                    help="scalar predicate, e.g. source=s1 or n_tok>=10 "
                         "(repeatable; AND-combined; zone-map pruned on "
                         "encoded sources)")
    co.add_argument("--include-columns", default=None)
    co.add_argument("--exclude-columns", default=None)
    co.add_argument("--sort", action="store_true")
    co.add_argument("--hex", action="store_true")
    co.add_argument("--limit", type=int, default=10)
    co.add_argument("--format", default=None, choices=["csv", "json", "parquet"])
    co.add_argument("--output", default=None)
    co.add_argument("--master", default=None)
    co.add_argument("--remember", action="store_true",
                    help="save this command as the directory default")

    argv = sys.argv[1:] if argv is None else argv
    args = ap.parse_args(argv)
    if args.cmd is None:
        # no command: run the directory's remembered default, like the
        # reference invoking its saved command when datatypes are omitted
        try:
            with open(REMEMBER_FILENAME) as f:
                remembered = json.load(f)
        except OSError:
            ap.error("specify a command, or save one with --remember first")
        return main(remembered["command"] + argv)
    if getattr(args, "remember", False):
        with open(REMEMBER_FILENAME, "w") as f:
            json.dump({"version": "cryo_spark 0.1.0",
                       "command": [a for a in argv if a != "--remember"]}, f)

    if args.cmd == "snapshots":
        # pure metadata: no Spark session needed to read the log
        from cryo_spark import snapshots as snap_mod

        for entry in snap_mod.log(args.output):
            print(json.dumps(entry))
        return 0

    if args.cmd == "iceberg-scan":
        # pure metadata: the whole point is planning WITHOUT an engine
        from cryo_spark import iceberg

        # bounds values are spec binary single-value serializations —
        # hex them for the JSON surface
        print(json.dumps(iceberg.scan_table(args.location,
                                            snapshot_id=args.snapshot),
                         default=lambda o: (o.hex()
                                            if isinstance(o, (bytes,
                                                              bytearray))
                                            else str(o))))
        return 0

    if args.cmd == "rollback":
        from cryo_spark import snapshots as snap_mod

        seq = snap_mod.rollback(args.output, args.to_seq)
        print(json.dumps({"snapshot": seq, "target": args.to_seq}))
        return 0

    if args.cmd == "tag":
        from cryo_spark import snapshots as snap_mod

        seq = snap_mod.tag(args.output, args.name, args.seq)
        print(json.dumps({"snapshot": seq, "tag": args.name,
                          "target": snap_mod.resolve_ref(args.output,
                                                         args.name)}))
        return 0

    if args.cmd == "register":
        from cryo_spark.catalog import Catalog

        Catalog(args.catalog).register(args.name, args.output,
                                       replace=args.replace)
        print(json.dumps({"registered": args.name, "output": args.output}))
        return 0

    if args.cmd == "tables":
        from cryo_spark.catalog import Catalog

        for name, info in Catalog(args.catalog).tables().items():
            print(json.dumps({"table": name, **info}))
        return 0

    if args.cmd == "branch":
        from cryo_spark import snapshots as snap_mod

        seq = snap_mod.branch(args.output, args.name, args.seq)
        print(json.dumps({"snapshot": seq, "branch": args.name}))
        return 0

    if args.cmd == "publish":
        from cryo_spark import snapshots as snap_mod

        seq = snap_mod.publish(args.output, args.name)
        print(json.dumps({"snapshot": seq, "published": args.name}))
        return 0

    from cryo_spark.session import get_spark

    try:
        spec = _resolve_table(args)
    except (ValueError, OSError) as exc:
        ap.error(str(exc))
    spark = get_spark(app=f"cryo_spark_{args.cmd}", master=args.master)
    try:
        if args.cmd == "freeze":
            import cryo_spark

            summary = cryo_spark.freeze(
                spark, args.input, args.output,
                target_tokens=args.target_tokens,
                overwrite=args.overwrite, dry_run=args.dry_run,
                keys=args.keys, n_chunks=args.n_chunks,
                partition_by=_split(args.partition_by),
                spec=spec, chunk_by=args.chunk_by, branch=args.branch,
                align_with=args.align_with,
            )
            print(json.dumps(summary))
            return 0

        if args.cmd == "iceberg-export":
            from cryo_spark import iceberg

            md_path = iceberg.export_frozen(spark, args.output,
                                            table_location=args.location,
                                            partitioned=args.partitioned,
                                            materialize=args.materialize)
            print(json.dumps({"metadata": md_path}))
            return 0

        if args.cmd == "compact":
            import cryo_spark

            summary = cryo_spark.compact(
                spark, args.output,
                target_tokens=args.target_tokens,
                min_tokens=args.min_tokens,
                max_chunks=args.max_chunks,
                spec=spec,
            )
            print(json.dumps(summary))
            return 0

        if args.cmd == "vacuum":
            import cryo_spark

            print(json.dumps(cryo_spark.vacuum(spark, args.output)))
            return 0

        if args.cmd == "consolidate":
            import cryo_spark

            print(json.dumps(
                cryo_spark.consolidate_manifests(spark, args.output)))
            return 0

        if args.cmd == "remove-orphans":
            import cryo_spark

            print(json.dumps(cryo_spark.remove_orphans(
                spark, args.output, min_age_s=args.min_age_s)))
            return 0

        if args.cmd == "delete":
            import cryo_spark

            print(json.dumps(cryo_spark.delete_where(
                spark, args.output, keys=args.keys,
                filters=_parse_filters(args.filter), spec=spec)))
            return 0

        if args.cmd == "verify":
            import cryo_spark

            report = cryo_spark.verify_output(spark, args.output)
            print(json.dumps(report))
            return 0 if report["status"] != "corrupt" else 1

        if args.cmd == "describe":
            import cryo_spark

            as_of = args.as_of
            if as_of is not None and as_of.lstrip("-").isdigit():
                as_of = int(as_of)
            for row in cryo_spark.describe(spark, args.output,
                                           as_of=as_of).collect():
                print(json.dumps(row.asDict(), default=str))
            return 0

        if args.cmd == "analyze":
            from cryo_spark.engine import analyze

            as_of = args.as_of
            if as_of is not None and as_of.lstrip("-").isdigit():
                as_of = int(as_of)
            cols = (None if args.columns is None
                    else [c.strip() for c in args.columns.split(",")])
            stats = analyze(spark, args.output, columns=cols, k=args.k,
                            as_of=as_of)
            print(json.dumps(stats))
            return 0

        if args.cmd == "pack":
            from cryo_spark import engine as eng
            from cryo_spark import layout as lay

            as_of = args.as_of
            if as_of is not None and as_of.lstrip("-").isdigit():
                as_of = int(as_of)
            print(json.dumps(eng.pack(
                spark, args.input, args.dest, window=args.window,
                spec=spec,
                target_tokens=(args.target_tokens
                               or lay.DEFAULT_TARGET_TOKENS),
                keys=args.keys, as_of=as_of,
                filters=_parse_filters(args.filter))))
            return 0

        if args.cmd == "export-shards":
            import cryo_spark

            as_of = args.as_of
            if as_of is not None and as_of.lstrip("-").isdigit():
                as_of = int(as_of)
            print(json.dumps(cryo_spark.export_shards(
                spark, args.input, args.dest, n_shards=args.n_shards,
                seed=args.seed, spec=spec, as_of=as_of, keys=args.keys,
                filters=_parse_filters(args.filter))))
            return 0

        if args.cmd == "upsert":
            import cryo_spark

            print(json.dumps(cryo_spark.upsert(
                spark, args.output, args.input,
                target_tokens=args.target_tokens, spec=spec)))
            return 0

        if args.cmd == "purge":
            import cryo_spark

            print(json.dumps(cryo_spark.purge_deletes(
                spark, args.output, target_tokens=args.target_tokens,
                spec=spec)))
            return 0

        import cryo_spark

        df = cryo_spark.collect(
            spark, args.input,
            columns=_split(args.columns),
            include=_split(args.include_columns),
            exclude=_split(args.exclude_columns),
            sort=args.sort, hex=args.hex, keys=args.keys,
            spec=spec,
            as_of=(int(args.as_of) if args.as_of is not None
                   and args.as_of.lstrip("-").isdigit() else args.as_of),
            filters=_parse_filters(args.filter),
        )
        if args.format:
            if not args.output:
                ap.error("--format requires --output")
            cryo_spark.export(df, args.output, format=args.format)
            print(json.dumps({"written": args.output, "format": args.format}))
        else:
            for row in df.limit(args.limit).collect():
                print(json.dumps(row.asDict(), default=str))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
