"""Controller daemon (reference: cmd/controller fx app).

    python -m aresdb_tpu.cmd.controller --port 9474 --root-path /tmp/ctrl
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ares-controller", description=__doc__)
    p.add_argument("--port", type=int, default=9474)
    p.add_argument("--root-path", default="")
    args = p.parse_args(argv)

    from aresdb_tpu.controller.server import ControllerServer
    from aresdb_tpu.controller.state import ControllerState

    state = ControllerState(args.root_path or None)
    server = ControllerServer(state, port=args.port)
    print(f"ares-controller serving on :{args.port}", file=sys.stderr)

    import asyncio

    import tornado.httpserver
    import tornado.ioloop
    import tornado.netutil

    asyncio.set_event_loop(asyncio.new_event_loop())
    sockets = tornado.netutil.bind_sockets(args.port)
    http = tornado.httpserver.HTTPServer(server.app)
    http.add_sockets(sockets)
    try:
        tornado.ioloop.IOLoop.current().start()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
