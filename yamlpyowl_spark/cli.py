"""Command-line surface (parity with the reference's ``yamlpyowl`` CLI,
script.py:10-52: ``yamlpyowl -c file.owl.yml`` → RDF/XML next to it).

    python -m yamlpyowl_spark.cli convert FILE.owl.yml [-o OUTDIR]
        → OUTDIR/triples.parquet + OUTDIR/triples.nt (N-Triples)
    python -m yamlpyowl_spark.cli query FILE.owl.yml "SPARQL..." [--reason]
        → result rows on stdout
    python -m yamlpyowl_spark.cli pipeline SRC_PARQUET OUTDIR [--resume]
        → full distributed pipeline (triples/errors/nodes/edges/_progress)
"""

from __future__ import annotations

import argparse
import os
import sys


def _escape_literal(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def ntriples_line(subj, pred, obj, is_lit, dtype) -> str:
    from . import vocab as V

    s = subj if subj.startswith("_:") else f"<{subj}>"
    p = f"<{pred}>"
    if is_lit:
        o = f'"{_escape_literal(obj)}"'
        if dtype and dtype != V.XSD_STRING:
            o += f"^^<{dtype}>"
    else:
        o = obj if obj.startswith("_:") else f"<{obj}>"
    return f"{s} {p} {o} ."


def cmd_convert(args, spark) -> int:
    from .api import OntologyManager
    from .export import DRIVER_EXPORT_MAX_ROWS, write_ntriples

    om = OntologyManager(args.file, spark)
    outdir = args.out or os.path.splitext(os.path.abspath(args.file))[0] + "_rdf"
    os.makedirs(outdir, exist_ok=True)
    om.triples.write.mode("overwrite").parquet(os.path.join(outdir, "triples.parquet"))
    sel = om.triples.select("subj", "pred", "obj", "obj_is_literal", "obj_datatype")
    n = sel.count()
    if n > DRIVER_EXPORT_MAX_ROWS:
        # corpus scale: format JVM-side, one part file per partition —
        # never funnel every triple through the driver
        write_ntriples(sel, os.path.join(outdir, "triples.nt.d"))
        print(
            f"wrote {n} triples to {outdir} (distributed N-Triples in "
            "triples.nt.d/; RDF/XML skipped at this scale)",
            file=sys.stderr,
        )
        return 0
    rows = sel.collect()
    with open(os.path.join(outdir, "triples.nt"), "w") as fh:
        for r in rows:
            fh.write(ntriples_line(*r) + "\n")
    # RDF/XML next to it — the reference CLI's output format
    # (script.py:51, onto.save(format="rdfxml"))
    from .rdfxml import write_rdfxml

    write_rdfxml([tuple(r) for r in rows], os.path.join(outdir, "triples.owl"), base_iri=om.iri)
    print(f"wrote {len(rows)} triples to {outdir}", file=sys.stderr)
    return 0


def cmd_query(args, spark) -> int:
    from .api import OntologyManager

    om = OntologyManager(args.file, spark)
    if args.reason:
        om.sync_reasoner()
    for item in sorted(map(str, om.make_query(args.sparql))):
        print(item)
    return 0


def cmd_pipeline(args, spark) -> int:
    from .plans.pipeline import KGPipeline
    from .sources.fixtures import build_default_import_map
    from .sources.scan import read_source_table

    src = read_source_table(spark, args.src)
    pipe = KGPipeline(spark, import_map=build_default_import_map())
    res = pipe.materialize(src, args.out, resume=args.resume, reason=args.reason)
    print(f"run {res['run_id']}: {res['n_new_docs']} new documents", file=sys.stderr)
    return 0


def main(argv=None, spark=None) -> int:
    ap = argparse.ArgumentParser(prog="yamlpyowl_spark")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="YAML ontology → triples parquet + N-Triples")
    c.add_argument("file")
    c.add_argument("-o", "--out", default=None)
    c.set_defaults(fn=cmd_convert)

    q = sub.add_parser("query", help="run a SPARQL-subset query against one document")
    q.add_argument("file")
    q.add_argument("sparql")
    q.add_argument("--reason", action="store_true", help="forward-chain SWRL rules first")
    q.set_defaults(fn=cmd_query)

    p = sub.add_parser("pipeline", help="distributed pipeline over a source table")
    p.add_argument("src")
    p.add_argument("out")
    p.add_argument(
        "--resume",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="skip documents already recorded in _progress (--no-resume reprocesses everything)",
    )
    p.add_argument(
        "--reason",
        action="store_true",
        help="also write inferred facts (SWRL chain + DL model search) per run",
    )
    p.set_defaults(fn=cmd_pipeline)

    args = ap.parse_args(argv)
    own_session = spark is None
    if own_session:
        from .plans.session import get_spark

        spark = get_spark(cpus=args.cpus, app_name="yamlpyowl-spark-cli")
    try:
        return args.fn(args, spark)
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
