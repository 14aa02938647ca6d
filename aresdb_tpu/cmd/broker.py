"""Broker daemon (reference: cmd/broker/cmd/cmd.go:43 aresbrokerd).

    python -m aresdb_tpu.cmd.broker --port 9574 \
        --controller localhost:9474 --namespace prod
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ares-broker", description=__doc__)
    p.add_argument("--port", type=int, default=9574)
    p.add_argument("--controller", required=True,
                   help="controller host:port")
    p.add_argument("--namespace", required=True)
    args = p.parse_args(argv)

    from aresdb_tpu.broker.server import BrokerServer
    from aresdb_tpu.broker.validator import BrokerSchemaView
    from aresdb_tpu.cluster.topology import DynamicTopology

    topo = DynamicTopology(args.controller, args.namespace)
    topo.start()
    schema_view = BrokerSchemaView(args.controller, args.namespace)
    schema_view.start()
    server = BrokerServer(topo, port=args.port, schema_view=schema_view)
    print(f"ares-broker serving on :{args.port}", file=sys.stderr)

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
        topo.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
