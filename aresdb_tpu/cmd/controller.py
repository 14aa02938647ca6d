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
    p.add_argument("--instance", default="",
                   help="instance name for HA leader election")
    p.add_argument("--elect", action="store_true",
                   help="run lease-based leader election over --root-path "
                        "(start 2+ replicas on the same root for HA)")
    p.add_argument("--lease-ttl", type=float, default=3.0)
    args = p.parse_args(argv)

    from aresdb_tpu.controller.server import ControllerServer
    from aresdb_tpu.controller.state import ControllerState

    state = ControllerState(args.root_path or None)
    server = ControllerServer(
        state, port=args.port,
        instance_name=args.instance or f"controller-{args.port}",
        advertise=f"localhost:{args.port}", elect=args.elect,
        lease_ttl=args.lease_ttl)
    print(f"ares-controller serving on :{args.port}"
          + (" (HA election on)" if args.elect else ""), file=sys.stderr)

    import asyncio

    import tornado.httpserver
    import tornado.ioloop
    import tornado.netutil

    asyncio.set_event_loop(asyncio.new_event_loop())
    sockets = tornado.netutil.bind_sockets(args.port)
    http = tornado.httpserver.HTTPServer(server.app)
    http.add_sockets(sockets)
    if server.elector is not None:
        server.elector.start()
    try:
        tornado.ioloop.IOLoop.current().start()
    except KeyboardInterrupt:
        pass
    finally:
        if server.elector is not None:
            server.elector.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
