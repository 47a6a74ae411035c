"""CLI driver — the console/workspace entry point analog.

The reference ships user-facing drivers (`FuzzyC2Cpg.Main`,
`console/.../Console.scala:331-388`, `CpgValidatorMain.scala:8-46`); this
is their Ray-Data transposition:

    python -m codepropertygraph_ray run      --sf-dir DIR --out DIR
    python -m codepropertygraph_ray undo     --out DIR --pass NAME
    python -m codepropertygraph_ray validate --out DIR
    python -m codepropertygraph_ray query    --name kg_triples --sf-dir DIR [-n 10]
    python -m codepropertygraph_ray queries

``run`` is resumable: completed passes are skipped via the overlay ledger
(LayerCreator semantics). The CLI owns the Ray session (library code never
calls ray.init — driver contract)."""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="codepropertygraph_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="build (or resume) the KG pipeline")
    run_p.add_argument("--sf-dir", required=True)
    run_p.add_argument("--out", required=True)

    undo_p = sub.add_parser("undo", help="undo a pass (and everything after it)")
    undo_p.add_argument("--out", required=True)
    undo_p.add_argument("--pass", dest="pass_name", required=True)
    undo_p.add_argument("--sf-dir", required=True)

    val_p = sub.add_parser("validate", help="re-validate a materialized graph")
    val_p.add_argument("--out", required=True)

    q_p = sub.add_parser("query", help="run one queries() entry")
    q_p.add_argument("--name", required=True)
    q_p.add_argument("--sf-dir", required=True)
    q_p.add_argument("-n", type=int, default=10, help="rows to print")

    sub.add_parser("queries", help="list available queries")

    ws_p = sub.add_parser("workspace", help="manage a workspace of projects "
                          "(WorkspaceManager.scala analog)")
    ws_p.add_argument("--path", required=True, help="workspace directory")
    ws_sub = ws_p.add_subparsers(dest="ws_cmd", required=True)
    ws_new = ws_sub.add_parser("create", help="create (build) a project")
    ws_new.add_argument("--sf-dir", required=True)
    ws_new.add_argument("--name", default=None)
    ws_sub.add_parser("list", help="list projects")
    ws_rm = ws_sub.add_parser("remove", help="remove a project")
    ws_rm.add_argument("--name", required=True)

    inc_p = sub.add_parser("ingest", help="append NEW conversations to a "
                           "built KG as one additive overlay pass")
    inc_p.add_argument("--out", required=True, help="existing KG output dir")
    inc_p.add_argument("--sf-dir", required=True, help="the base corpus dir")
    inc_p.add_argument("--inc", required=True,
                       help="transcripts-schema parquet dir/file to append")
    inc_p.add_argument("--name", required=True, help="increment name (ledger key)")

    sc_p = sub.add_parser("script", help="run a Python script against an open "
                          "project (ScriptManager.scala analog)")
    sc_p.add_argument("--path", required=True, help="workspace directory")
    sc_p.add_argument("--project", required=True)
    sc_p.add_argument("--script", required=True, help="script file to run")
    sc_p.add_argument("--param", action="append", default=[],
                      help="key=value (repeatable)")

    args = p.parse_args(argv)

    if args.cmd == "queries":
        sys.path.insert(0, __file__.rsplit("/", 2)[0])
        import __ray_entry__ as entrymod

        oracled = set(entrymod.oracle_sql())
        for name in sorted(entrymod.queries()):
            print(f"{name}{'' if name in oracled else '  (no SQL oracle)'}")
        return 0

    if args.cmd == "workspace" and args.ws_cmd == "list":
        from .workspace import WorkspaceManager

        for proj in WorkspaceManager(args.path).projects():
            print(json.dumps({"name": proj.name, "inputPath": proj.sf_dir,
                              "path": proj.path}))
        return 0
    if args.cmd == "workspace" and args.ws_cmd == "remove":
        from .workspace import WorkspaceManager

        WorkspaceManager(args.path).remove_project(args.name)
        print(json.dumps({"removed": args.name}))
        return 0

    ray = _init_ray(args.num_cpus)
    try:
        if args.cmd == "workspace" and args.ws_cmd == "create":
            from .workspace import WorkspaceManager

            proj = WorkspaceManager(args.path).create_project(
                args.sf_dir, args.name
            )
            print(json.dumps({"created": proj.name, "path": proj.path}))
        elif args.cmd == "script":
            from .workspace import WorkspaceManager, run_script

            ws = WorkspaceManager(args.path)
            runner = ws.open(args.project)
            params = dict(kv.split("=", 1) for kv in args.param)
            result = run_script(args.script, runner, params)
            if result is not None:
                df = result.to_pandas() if hasattr(result, "to_pandas") else result
                print(df if not hasattr(df, "head") else df.head(20).to_string())
        elif args.cmd == "ingest":
            from .pipelines.incremental import ingest_increment
            from .pipelines.kg import build_kg

            runner = build_kg(args.sf_dir, args.out)  # attach/resume
            ingest_increment(runner, args.inc, args.name)
            led = runner.ledger()
            print(json.dumps({"applied": led["applied"]}))
        elif args.cmd == "run":
            from .pipelines.kg import build_kg

            runner = build_kg(args.sf_dir, args.out)
            led = runner.ledger()
            print(json.dumps({"applied": led["applied"],
                              "metrics": {k: round(v["wall_sec"], 3)
                                          for k, v in led["metrics"].items()}}))
        elif args.cmd == "undo":
            from .pipelines.kg import build_kg

            runner = build_kg(args.sf_dir, args.out)  # resume = no-op re-attach
            runner.undo_pass(args.pass_name)
            print(json.dumps({"applied": runner.ledger()["applied"]}))
        elif args.cmd == "validate":
            import os

            import pyarrow.dataset as pads
            import ray.data

            from .stages.validate import validate_graph

            mat = None
            for d in sorted(os.listdir(args.out)):
                if d.endswith("_materialize"):
                    mat = os.path.join(args.out, d)
            if mat is None:
                print("no materialize overlay found", file=sys.stderr)
                return 2
            nodes_dir, edges_dir = f"{mat}/nodes", f"{mat}/edges"
            n_nodes = pads.dataset(nodes_dir).count_rows()
            from .sources.fastread import fast_read_parquet

            viols = validate_graph(
                lambda: fast_read_parquet(nodes_dir),
                lambda: fast_read_parquet(edges_dir),
                n_nodes=n_nodes,
            )
            print(json.dumps({"n_nodes": n_nodes, "violations": viols.num_rows}))
            if viols.num_rows:
                print(viols.to_pandas().head(20).to_string(), file=sys.stderr)
                return 1
        elif args.cmd == "query":
            sys.path.insert(0, __file__.rsplit("/", 2)[0])
            import __ray_entry__ as entrymod

            qs = entrymod.queries()
            if args.name not in qs:
                print(f"unknown query {args.name!r}; see `queries`", file=sys.stderr)
                return 2
            res = qs[args.name](args.sf_dir)
            import ray.data

            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            print(df.head(args.n).to_string())
            print(f"... {len(df)} rows")
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
