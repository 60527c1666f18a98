"""Command-line client: run DSL scripts or an interactive REPL.

Mirrors the reference's two client entry points (SURVEY.md §3):
batch ``client < script.txt`` and ``client --interactive``. There is no
client/server split — the SparkSession driver plays the server role and
executors replace the worker threadpool.

Usage:
    python -m kstore_spark [--db DIR] [script.txt ...]   # batch
    python -m kstore_spark [--db DIR] --interactive      # REPL
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kstore_spark", description=__doc__)
    ap.add_argument("scripts", nargs="*", help="DSL script files (default: stdin)")
    ap.add_argument("--db", default="./kstore_db", help="database directory")
    ap.add_argument("--loaddir", default=None,
                    help="directory relative load() paths resolve against "
                         "(the reference client's --loaddir)")
    ap.add_argument("--interactive", action="store_true", help="REPL mode")
    args = ap.parse_args(argv)

    # import late so --help stays instant
    from kstore_spark.engine import Engine, EngineError
    from kstore_spark.parser import ParseError
    from kstore_spark.session import get_spark

    engine = Engine(get_spark("kstore-cli"), args.db, load_dir=args.loaddir)

    def run(text: str) -> int:
        try:
            out = engine.run_script(text)
        except (ParseError, EngineError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        if out:
            print(out)
        return 0

    try:
        if args.interactive:
            while True:
                try:
                    line = input("kstore> ")
                except EOFError:
                    break
                if line.strip() in ("quit", "exit"):
                    break
                run(line)
            return 0

        if args.scripts:
            rc = 0
            for path in args.scripts:
                with open(path) as f:
                    rc |= run(f.read())
            return rc
        return run(sys.stdin.read())
    finally:
        engine.close()  # unpin this session's snapshot epoch


if __name__ == "__main__":
    raise SystemExit(main())
