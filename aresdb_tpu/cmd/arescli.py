"""arescli: interactive SQL/AQL shell (reference: cmd/arescli ishell).

    python -m aresdb_tpu.cmd.arescli --host localhost --port 9374
"""

from __future__ import annotations

import argparse
import json
import sys


def render_table(headers, rows) -> str:
    """ASCII table (reference utils/table_writer.go)."""
    widths = [len(str(h)) for h in headers]
    for row in rows:
        for i, v in enumerate(row):
            widths[i] = max(widths[i], len(str(v)))
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep,
           "|" + "|".join(f" {str(h):<{w}} " for h, w in zip(headers, widths))
           + "|", sep]
    for row in rows:
        out.append("|" + "|".join(
            f" {str(v):<{w}} " for v, w in zip(row, widths)) + "|")
    out.append(sep)
    return "\n".join(out)


def flatten_result(result, prefix=()):
    """Nested dim tree → rows."""
    rows = []
    for k, v in sorted(result.items()):
        if isinstance(v, dict):
            rows.extend(flatten_result(v, prefix + (k,)))
        else:
            rows.append(prefix + (k, v))
    return rows


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="arescli", description=__doc__)
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=9374)
    p.add_argument("-e", "--execute", help="run one statement and exit")
    args = p.parse_args(argv)

    import requests

    base = f"http://{args.host}:{args.port}"

    def run(stmt: str) -> None:
        stmt = stmt.strip().rstrip(";")
        if not stmt:
            return
        if stmt.startswith("{"):
            body = {"queries": [json.loads(stmt)]}
            r = requests.post(f"{base}/query/aql", json=body)
        elif stmt.lower() in ("show tables", "tables"):
            r = requests.get(f"{base}/schema/tables")
            print("\n".join(r.json()))
            return
        elif stmt.lower().startswith("desc "):
            r = requests.get(f"{base}/schema/tables/{stmt.split()[1]}")
            print(json.dumps(r.json(), indent=2))
            return
        else:
            r = requests.post(f"{base}/query/sql", json={"queries": [stmt]})
        body = r.json()
        if body.get("errors") and any(body["errors"]):
            print("error:", body["errors"], file=sys.stderr)
            return
        result = body["results"][0]
        if "matrixData" in result:
            print(render_table(result.get("headers", []),
                               result["matrixData"]))
        else:
            rows = flatten_result(result)
            n_dims = max((len(r) - 1 for r in rows), default=1)
            headers = [f"dim{i}" for i in range(n_dims)] + ["value"]
            print(render_table(headers, rows))

    if args.execute:
        run(args.execute)
        return 0

    print(f"connected to {base}; SQL statements, AQL JSON, "
          f"'show tables', 'desc <t>', 'exit'", file=sys.stderr)
    while True:
        try:
            line = input("ares> ")
        except (EOFError, KeyboardInterrupt):
            break
        if line.strip().lower() in ("exit", "quit"):
            break
        try:
            run(line)
        except Exception as e:
            print("error:", e, file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
