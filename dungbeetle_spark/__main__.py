"""``python -m dungbeetle_spark`` — server entry point.

The analog of the reference's ``cmd/main.go``: layer config (TOML +
``DUNGBEETLE_`` env + flags), wire the core, load tasks, start workers
and — unless ``--worker-only`` — the HTTP server.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="dungbeetle-spark")
    p.add_argument("--config", default="config.toml", help="TOML config path")
    p.add_argument("--server", default=None, help="bind address host:port")
    p.add_argument(
        "--sql-directory",
        action="append",
        default=None,
        help="dir with .sql task files (repeatable)",
    )
    p.add_argument("--queue", default=None, help="default queue name")
    p.add_argument("--worker-concurrency", type=int, default=None)
    p.add_argument("--worker-only", action="store_true")
    p.add_argument(
        "--serve-store",
        default=None,
        metavar="HOST:PORT",
        help="also serve the file job_store over TCP (netdbapi) so "
        "worker machines can reach it via job_store_dbapi = "
        "dungbeetle_spark.netdbapi:connect — the single-host broker "
        "deployment without a database server",
    )
    args = p.parse_args(argv)

    from dungbeetle_spark.config import build_core, load_config

    cfg = load_config(args.config)
    if args.server:
        cfg.server = args.server
    if args.sql_directory:
        cfg.sql_directories = args.sql_directory
    if args.queue:
        cfg.default_queue = args.queue
    if args.worker_concurrency:
        cfg.worker_concurrency = args.worker_concurrency
    if args.worker_only:
        cfg.worker_only = True

    core = build_core(cfg)
    store_server = None
    if args.serve_store:
        if not cfg.job_store:
            p.error("--serve-store requires a file job_store in the config")
        from dungbeetle_spark import netdbapi

        host, _, port = args.serve_store.partition(":")
        store_server = netdbapi.NetDBAPIServer(
            cfg.job_store, host or "127.0.0.1", int(port or 0)
        )
        store_server.start()
        print(
            f"job_store served on {store_server.address} "
            "(dungbeetle_spark.netdbapi:connect)",
            file=sys.stderr,
        )
    core.start()
    if cfg.worker_only:
        import threading

        threading.Event().wait()  # workers only; no HTTP (cmd/main.go:72-75)
        return 0

    from dungbeetle_spark.http_api import Server

    host, _, port = cfg.server.partition(":")
    server = Server(core, host or "127.0.0.1", int(port or 6060))
    print(f"dungbeetle-spark listening on {server.address}", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()
        core.stop()
        if store_server is not None:
            store_server.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
