"""CLI entry point — bin/server.ml parity.

Usage::

    python -m sakura_spark.server <config-file>

Reads the (server (storage ...) (transport ...)) S-expression
configuration, assembles the engine (sakura_spark.system), and serves the
six-sublanguage wire protocol until interrupted. Exit codes and stderr
messages match the reference binary: usage error -> 1 with
"Usage: ... <config-file>", any initialization failure -> 1 with
"Couldn't initialize: <reason>" (bin/server.ml:3-13).
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv if argv is None else argv
    if len(argv) != 2:
        print(f"Usage: {argv[0]} <config-file>", file=sys.stderr)
        return 1
    from sakura_spark.system import ConfigError, run_from_config

    try:
        run = run_from_config(argv[1])
    except ConfigError as e:
        print(f"Couldn't initialize: {e}", file=sys.stderr)
        return 1
    run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
