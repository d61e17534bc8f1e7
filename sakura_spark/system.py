"""System assembly — the composition root (lib/system.ml, lib/configuration.ml,
bin/server.ml parity).

The reference boots its server from an S-expression configuration file::

    (server
      (storage (memory))
      (transport (tcp (address "127.0.0.1") (port 4567))))

``Configuration.parse_server`` (lib/configuration.ml:33-51) maps section
names to tagged subtrees, rejecting unknown/duplicate/empty sections;
``System.assemble`` (lib/system.ml:69-105) resolves the storage and
transport tags through a provider registry, creates the initial database
named "sakura" with the prelude relations registered, and returns a run
thunk that starts the listener; ``bin/server.ml`` is the two-line CLI
around ``run_from_config``. This module mirrors that shape — same config
grammar, same error message strings (they are part of the observable
surface: a misconfigured deployment sees them) — with Python exceptions
standing in for the OCaml result strings.

Registry divergences, documented:

* ``memory`` storage maps to a :class:`SnapshotStore` in a fresh temp
  directory. Spark DataFrames need a filesystem materialization substrate
  (snapshots are parquet + JSON manifests), so "memory" here means
  "process-lifetime scratch storage", the closest honest analogue of the
  reference's in-process hashtable (lib/management/physical.ml:125-209).
  A ``directory`` tag (extension) accepts ``(directory (path "..."))``
  for durable stores.
* The prelude relations need no storage registration: the DRL compiler
  resolves them intensionally (sakura_spark/prelude.py), so the
  reference's initialize_multigroup warning loop (lib/system.ml:41-67)
  has no analogue — nothing can fail to register.
"""

from __future__ import annotations

import tempfile

from sakura_spark.drl.parser import ParseError, _atom_str, read_sexp


class ConfigError(ValueError):
    """A configuration file failed to parse or validate; the message is
    the reference's error string verbatim."""


def _to_string(x) -> str:
    """Sexp back to text (Sexplib.Sexp.to_string shape) for error payloads."""
    from sakura_spark.wire import _parsed_sexp_str

    return _parsed_sexp_str(x)


def parse_server(sexp, expected_keys: list[str]) -> dict:
    """``(server (section ...) ...)`` -> {section: tagged subtree}.

    Message-for-message with Configuration.parse_server/insert_section
    (lib/configuration.ml:14-51): unknown, duplicate, empty, and
    multi-valued sections are rejected."""
    if not (isinstance(sexp, list) and len(sexp) >= 1 and sexp[0] == "server"):
        raise ConfigError("Configuration must be a (server ...) s-expression")
    expected = set(expected_keys)
    out: dict = {}
    for section in sexp[1:]:
        if not (
            isinstance(section, list)
            and len(section) >= 1
            and isinstance(section[0], str)
        ):
            raise ConfigError(
                f"Malformed configuration section: {_to_string(section)}"
            )
        key, body = _atom_str(section[0]), section[1:]
        if key not in expected:
            raise ConfigError(f"Unknown configuration section: {key}")
        if key in out:
            raise ConfigError(f"Duplicate configuration section: {key}")
        if len(body) == 0:
            raise ConfigError(
                f"Configuration section {key} is empty (expected a tagged value)"
            )
        if len(body) > 1:
            raise ConfigError(
                f"Configuration section {key} has multiple values "
                "(expected exactly one)"
            )
        out[key] = body[0]
    return out


def load_config(path: str, expected_keys: list[str]) -> dict:
    """Read + parse a config file (Configuration.load)."""
    try:
        with open(path, encoding="utf-8") as fh:
            text = fh.read()
    except OSError as e:
        raise ConfigError(
            f"Failed to load configuration file {path}: {e.strerror or e}"
        ) from e
    try:
        sexp = read_sexp(text)
    except ParseError as e:
        raise ConfigError(
            f"Failed to parse configuration file {path}: {e}"
        ) from e
    return parse_server(sexp, expected_keys)


def require_section(config: dict, name: str, valid_tags: list[str]):
    """Section -> (tag, body) with tag validation (Configuration.
    require_section + extract_tagged_section)."""
    sexp = config.get(name)
    if sexp is None:
        raise ConfigError(f"Missing ({name} ...) section in configuration")
    if not (isinstance(sexp, list) and len(sexp) >= 1 and isinstance(sexp[0], str)):
        raise ConfigError(f"Expected (tag ...) but got: {_to_string(sexp)}")
    tag, body = _atom_str(sexp[0]), sexp[1:]
    if tag not in valid_tags:
        raise ConfigError(f"Unknown {name}: {tag}")
    return tag, body


# --- provider registries (lib/system.ml:24-39) -------------------------------


def _storage_memory(body):
    from sakura_spark.management.store import SnapshotStore

    # MemoryBackend.parse (lib/management/physical.ml:137-143): the memory
    # backend takes NO configuration — `(memory)` is the accepted form;
    # anything else (including the docs' `(memory ())`) is rejected with
    # the reference's own message.
    if body != []:
        raise ConfigError(
            "memory backend takes no configuration, got: "
            + _to_string(body[0] if len(body) == 1 else body)
        )
    return SnapshotStore(tempfile.mkdtemp(prefix="sakura-store-"))


def _storage_directory(body):
    """Extension: (directory (path "/var/lib/sakura")) — durable store."""
    from sakura_spark.management.store import SnapshotStore

    fields = {}
    for f in body:
        if not (isinstance(f, list) and len(f) == 2 and isinstance(f[0], str)):
            raise ConfigError(f"storage/directory: unexpected: {_to_string(f)}")
        fields[_atom_str(f[0])] = _atom_str(f[1])
    if set(fields) != {"path"}:
        raise ConfigError("storage/directory: expected exactly (path ...)")
    return SnapshotStore(fields["path"])


def _transport_tcp(body):
    """TCP.parse (lib/transport.ml:31-50): (address + port) XOR (path)."""
    addr = port = path = None
    for f in body:
        if (
            isinstance(f, list)
            and len(f) == 2
            and isinstance(f[0], str)
            and isinstance(f[1], str)
        ):
            key, val = _atom_str(f[0]), _atom_str(f[1])
            if key == "address":
                addr = val
                continue
            if key == "port":
                try:
                    port = int(val)
                except ValueError:
                    raise ConfigError(f"transport/tcp: invalid port: {val}") from None
                continue
            if key == "path":
                path = val
                continue
        raise ConfigError(f"transport/tcp: unexpected: {_to_string(f)}")
    if addr is not None and port is not None and path is None:
        return {"host": addr, "port": port, "path": None}
    if addr is None and port is None and path is not None:
        return {"host": None, "port": None, "path": path}
    if addr is None and port is None and path is None:
        raise ConfigError("transport/tcp: no address fields")
    raise ConfigError("transport/tcp: use (address + port) or (path), not both")


STORAGE_REGISTRY = {"memory": _storage_memory, "directory": _storage_directory}
TRANSPORT_REGISTRY = {"tcp": _transport_tcp}


# --- assembly (lib/system.ml:69-110) -----------------------------------------


def assemble(config: dict, spark=None):
    """Resolve providers and build the (frontend, server) pair.

    Returns the started-but-not-yet-listening pieces so callers (tests,
    embedders) can manage the lifecycle; :func:`run_from_config` wraps
    this in the reference's blocking run thunk. The database is named
    "sakura" like the reference's initial multigroup (lib/system.ml:95)."""
    from sakura_spark import get_spark
    from sakura_spark.wire import Server, TcpFrontend

    storage_tag, storage_body = require_section(
        config, "storage", sorted(STORAGE_REGISTRY)
    )
    store = STORAGE_REGISTRY[storage_tag](storage_body)
    transport_tag, transport_body = require_section(
        config, "transport", sorted(TRANSPORT_REGISTRY)
    )
    address = TRANSPORT_REGISTRY[transport_tag](transport_body)
    server = Server(spark or get_spark("sakura-server"), "sakura", store=store)
    frontend = TcpFrontend(server, **address)
    return frontend, server


def run_from_config(path: str, spark=None):
    """Config file -> blocking run thunk (System.run_from_config +
    Transport.TCP.listen's startup line)."""
    config = load_config(path, expected_keys=["storage", "transport"])
    frontend, _server = assemble(config, spark=spark)

    def run() -> None:
        where = (
            frontend.path
            if frontend.path is not None
            else f"{frontend.host}:{frontend.port}"
        )
        print(f"Listening on {where}", flush=True)  # lib/transport.ml:66-68
        frontend.start()
        frontend._accept_thread.join()

    return run
