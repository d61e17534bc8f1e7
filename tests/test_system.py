"""Composition-root conformance — lib/configuration.ml + lib/system.ml +
bin/server.ml: the (server ...) config grammar with the reference's exact
error strings, provider-registry dispatch, and an end-to-end boot from a
config file to a live wire round trip."""

import socket as pysocket

import pytest

from sakura_spark.system import (
    ConfigError,
    assemble,
    load_config,
    parse_server,
    require_section,
    run_from_config,
)
from sakura_spark.drl.parser import read_sexp

KEYS = ["storage", "transport"]


def _parse(text):
    return parse_server(read_sexp(text), KEYS)


def test_parse_server_happy_path():
    cfg = _parse(
        '(server (storage (memory)) '
        '(transport (tcp (address "127.0.0.1") (port 4567))))'
    )
    assert set(cfg) == {"storage", "transport"}
    assert require_section(cfg, "storage", ["memory"])[0] == "memory"
    tag, body = require_section(cfg, "transport", ["tcp"])
    assert tag == "tcp" and len(body) == 2


def test_parse_server_error_strings_match_reference():
    """Each rejection carries lib/configuration.ml's message verbatim."""
    with pytest.raises(ConfigError, match=r"must be a \(server ...\)"):
        _parse("(nope (storage (memory)))")
    with pytest.raises(ConfigError, match="Unknown configuration section: extra"):
        _parse("(server (extra (x)))")
    with pytest.raises(ConfigError, match="Duplicate configuration section: storage"):
        _parse("(server (storage (memory)) (storage (memory)))")
    with pytest.raises(
        ConfigError, match="section storage is empty"
    ):
        _parse("(server (storage))")
    with pytest.raises(ConfigError, match="has multiple values"):
        _parse("(server (storage (memory) (memory)))")
    cfg = _parse("(server (storage (memory)))")
    with pytest.raises(
        ConfigError, match=r"Missing \(transport ...\) section"
    ):
        require_section(cfg, "transport", ["tcp"])
    with pytest.raises(ConfigError, match="Unknown storage: etcd"):
        require_section(_parse("(server (storage (etcd)))"), "storage", ["memory"])


def test_memory_backend_rejects_configuration():
    """lib/management/physical.ml:137-143: the memory backend takes no
    configuration — `(memory)` is accepted, `(memory ())` is not."""
    cfg = _parse("(server (storage (memory ())) (transport (tcp (port 1))))")
    with pytest.raises(
        ConfigError, match="memory backend takes no configuration"
    ):
        assemble(cfg)


def test_tcp_transport_field_validation():
    """lib/transport.ml:31-50 message parity."""
    base = '(server (storage (memory)) (transport (tcp {})))'
    for fields, msg in [
        ("", "no address fields"),
        ('(address "1.2.3.4") (path "/tmp/x")', "not both"),
        ('(address "1.2.3.4") (port 1) (path "/tmp/x")', "not both"),
        ('(port "zzz")', "invalid port: zzz"),
        ("(bogus 1)", "unexpected"),
    ]:
        with pytest.raises(ConfigError, match=msg):
            assemble(_parse(base.format(fields)))


def test_load_config_missing_file(tmp_path):
    with pytest.raises(ConfigError, match="Failed to load configuration file"):
        load_config(str(tmp_path / "nope.sexp"), KEYS)
    bad = tmp_path / "bad.sexp"
    bad.write_text("(server (storage")
    with pytest.raises(ConfigError, match="Failed to parse configuration file"):
        load_config(str(bad), KEYS)


def test_boot_from_config_file_end_to_end(spark, tmp_path):
    """bin/server.ml's whole path minus the blocking accept loop: a config
    file assembles a live server named "sakura" whose TCP frontend answers
    wire commands; the prelude relations resolve (they need no storage
    registration in this engine)."""
    cfg_file = tmp_path / "server.sexp"
    cfg_file.write_text(
        '(server (storage (memory)) '
        '(transport (tcp (address "127.0.0.1") (port 0))))'
    )
    config = load_config(str(cfg_file), KEYS)
    frontend, server = assemble(config, spark=spark)
    assert server.db.name == "sakura"  # lib/system.ml:95
    with frontend:
        c = pysocket.create_connection((frontend.host, frontend.port), timeout=30)
        f = c.makefile("rw", encoding="utf-8")

        def send(cmd):
            f.write(cmd)
            f.flush()
            return f.readline().strip()

        r = send('(ddl (CreateRelation (name "t") (schema (("v" "integer")))))')
        assert r.startswith('(ok (message "Relation created: t")')
        assert "(db_name sakura)" in r
        send('(dml (InsertTuple (relation "t") (attributes (("v" (Int 7))))))')
        r = send('(drl (Base "t"))')
        assert "(rows (((v 7))))" in r
        # The catalog (and with it the engine assembly) is queryable.
        r = send('(drl (Base "sakura:relation"))')
        assert r.startswith("(relation (name sakura:relation)")
        c.close()


def test_unix_socket_boot(spark, tmp_path):
    cfg_file = tmp_path / "unix.sexp"
    sock = tmp_path / "srv.sock"
    cfg_file.write_text(
        f'(server (storage (memory)) (transport (tcp (path "{sock}"))))'
    )
    frontend, server = assemble(load_config(str(cfg_file), KEYS), spark=spark)
    with frontend:
        c = pysocket.socket(pysocket.AF_UNIX, pysocket.SOCK_STREAM)
        c.settimeout(30)
        c.connect(str(sock))
        f = c.makefile("rw", encoding="utf-8")
        f.write("(dcl (GetHead))")
        f.flush()
        assert f.readline().startswith('(ok (message "HEAD is unset")')
        c.close()


def test_cli_usage_and_config_errors(tmp_path, capsys):
    """bin/server.ml:3-13: wrong arity -> usage on stderr, exit 1; a bad
    config -> "Couldn't initialize: <reason>", exit 1."""
    from sakura_spark.server import main

    assert main(["server"]) == 1
    assert "Usage: server <config-file>" in capsys.readouterr().err
    bad = tmp_path / "bad.sexp"
    bad.write_text("(server (storage (etcd)))")
    assert main(["server", str(bad)]) == 1
    err = capsys.readouterr().err
    assert err.startswith("Couldn't initialize: ")
    assert "Unknown storage: etcd" in err
