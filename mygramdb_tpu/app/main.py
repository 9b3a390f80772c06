"""CLI entry point (reference app/command_line_parser + src/main.cpp:20).

    mygramdb-tpu --config config.yaml [--seed data.jsonl] [--restore x.dmp]
    mygramdb-tpu --config config.yaml --config-test
"""

from __future__ import annotations

import argparse
import sys

from .. import __version__
from ..utils.errors import ConfigError


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mygramdb-tpu",
        description="TPU-native in-memory n-gram full-text search engine "
                    "with MySQL binlog replication")
    p.add_argument("-c", "--config", required=False,
                   help="path to YAML/JSON config file")
    p.add_argument("--config-test", action="store_true",
                   help="validate the config file and exit")
    p.add_argument("--seed", help="seed data file (JSONL/TSV) to load when "
                                  "tables are empty")
    p.add_argument("--restore", help="dump file to restore on startup")
    p.add_argument("-d", "--daemon", action="store_true",
                   help="daemonize (requires logging.file)")
    p.add_argument("-V", "--version", action="version",
                   version=f"mygramdb-tpu {__version__}")
    return p


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    if not args.config:
        print("error: --config is required", file=sys.stderr)
        return 2
    from ..config import load_config
    try:
        config = load_config(args.config)
    except ConfigError as e:
        print(f"config error: {e.message}", file=sys.stderr)
        return 1
    if args.config_test:
        print("config OK")
        return 0
    if args.daemon:
        if not config.logging.file:
            print("error: --daemon requires logging.file", file=sys.stderr)
            return 1
        import os
        if os.fork() > 0:
            return 0
        os.setsid()
        if os.fork() > 0:
            return 0
    from .application import Application
    app = Application(config, seed_path=args.seed, restore_dump=args.restore)
    app.register_stack_dump_signal()  # before slow warmup compiles
    app.initialize()
    return app.run()


if __name__ == "__main__":
    sys.exit(main())
