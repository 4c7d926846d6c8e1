"""ext surface tests: named-signal registry (O9, reference
ext/signals.py:4-37), multi-DB engine registry (O10, ext/engines.py:4-24),
HTTPLogin flow (clients.py:423-448), and the JDBC option-assembly
plumbing (S6/W3 — the sandbox has no JDBC driver, so the option maps
are pinned instead of a live round-trip)."""

from __future__ import annotations

import pytest

from flask_data_pipes_spark.ext.engines import BindNotFound, EngineRegistry, JdbcBind
from flask_data_pipes_spark.ext.signals import NamedSignal, Signal, signals
from flask_data_pipes_spark.sinks.writers import jdbc_write_options
from flask_data_pipes_spark.sources.files import jdbc_scan_options


# --- signals (O9) -----------------------------------------------------------


def test_signal_register_connect_send():
    reg = Signal()
    sig = reg.register("job_complete", doc="fired when done")
    seen = []
    sig.connect(lambda sender, **kw: seen.append((sender, kw)) or "ack")

    results = reg.job_complete.send("the-app", n=3)
    assert seen == [("the-app", {"n": 3})]
    assert [r for _, r in results] == ["ack"]


def test_signal_register_with_subscriber_and_reregister():
    reg = Signal()
    hits = []
    reg.register("evt", subscriber=lambda s, **kw: hits.append(1))
    # re-register keeps the existing signal and its receivers
    reg.register("evt", subscriber=lambda s, **kw: hits.append(2))
    reg.evt.send(None)
    assert sorted(hits) == [1, 2]


def test_signal_unregistered_attribute_raises():
    reg = Signal()
    assert bool(reg) is True  # truthy even when empty (reference __bool__)
    with pytest.raises(KeyError, match="Unregistered signal requested"):
        reg.nope


def test_signal_disconnect():
    sig = NamedSignal("s")
    fn = lambda s, **kw: "x"  # noqa: E731
    sig.connect(fn)
    sig.disconnect(fn)
    assert sig.send(None) == []


def test_register_model_sends_etl_tables_imported(spark, tmp_path):
    from flask_data_pipes_spark.models import Model, fields
    from flask_data_pipes_spark.pipeline import Pipeline
    from flask_data_pipes_spark.session import EngineConfig

    class SigModel(Model):
        x = fields.String()

    class SigPipeline(Pipeline):
        transform = True

    events = []
    receiver = lambda sender, **kw: events.append((sender, kw))  # noqa: E731
    signals.etl_tables_imported.connect(receiver)
    try:
        pipe = SigPipeline(
            model=SigModel,
            spark=spark,
            config=EngineConfig(data_dir=str(tmp_path / "d")),
        )
        row = pipe.register_model(SigModel)
    finally:
        signals.etl_tables_imported.disconnect(receiver)

    assert len(events) == 1
    sender, kw = events[0]
    assert sender is pipe
    assert kw["model"] is SigModel
    assert kw["row"]["name"] == row["name"]


# --- engine registry (O10) --------------------------------------------------


def test_engine_registry_resolves_named_binds():
    reg = EngineRegistry(
        {
            "warehouse": {
                "url": "jdbc:postgresql://db:5432/wh",
                "driver": "org.postgresql.Driver",
                "user": "etl",
                "password": "s3cret",
                "options": {"fetchsize": "10000"},
            },
            "audit": JdbcBind(url="jdbc:sqlite:/tmp/a.db"),
        }
    )
    assert reg.warehouse.url == "jdbc:postgresql://db:5432/wh"
    assert reg["audit"].url == "jdbc:sqlite:/tmp/a.db"
    opts = reg.warehouse.connection_options()
    assert opts == {
        "fetchsize": "10000",
        "driver": "org.postgresql.Driver",
        "user": "etl",
        "password": "s3cret",
    }
    # per-call overrides win over bind defaults
    assert reg.warehouse.connection_options(fetchsize="500")["fetchsize"] == "500"


def test_engine_registry_missing_bind_raises():
    reg = EngineRegistry({})
    with pytest.raises(BindNotFound, match="does not exist: 'nope'"):
        reg.nope


def test_pipeline_exposes_engines_from_config(spark, tmp_path):
    from flask_data_pipes_spark.models import Model, fields
    from flask_data_pipes_spark.pipeline import Pipeline
    from flask_data_pipes_spark.session import EngineConfig

    class EngModel(Model):
        x = fields.String()

    class EngPipeline(Pipeline):
        transform = True

    cfg = EngineConfig(
        data_dir=str(tmp_path / "d"),
        jdbc_binds={"meta": {"url": "jdbc:h2:mem:test"}},
    )
    pipe = EngPipeline(model=EngModel, spark=spark, config=cfg)
    assert pipe.engines.meta.url == "jdbc:h2:mem:test"


# --- JDBC option plumbing (S6/W3) ------------------------------------------


def test_jdbc_scan_options_partitioned():
    opts = jdbc_scan_options(
        "jdbc:postgresql://db/wh",
        "SELECT * FROM t",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
        fetchsize=5000,
    )
    # partitioned scans must use dbtable (Spark rejects
    # query+partitionColumn together — proven live against Derby)
    assert opts == {
        "url": "jdbc:postgresql://db/wh",
        "dbtable": "(SELECT * FROM t) AS sparkq",
        "partitionColumn": "id",
        "lowerBound": "0",
        "upperBound": "1000000",
        "numPartitions": "16",
        "fetchsize": "5000",
    }


def test_jdbc_scan_options_requires_bounds():
    with pytest.raises(ValueError, match="requires lower_bound"):
        jdbc_scan_options("u", "q", partition_column="id")


def test_jdbc_write_options():
    opts = jdbc_write_options(
        "jdbc:postgresql://db/wh", "target", batchsize=10000, isolationLevel="NONE"
    )
    assert opts == {
        "url": "jdbc:postgresql://db/wh",
        "dbtable": "target",
        "batchsize": "10000",
        "isolationLevel": "NONE",
    }


def test_bind_read_write_assemble_options(monkeypatch):
    """The bind fronts read_jdbc/write_jdbc with its profile merged in."""
    captured = {}

    def fake_read(spark, url, query, **kw):
        captured["read"] = (url, query, kw)
        return "df"

    def fake_write(df, url, table, mode="append", **kw):
        captured["write"] = (url, table, mode, kw)

    import flask_data_pipes_spark.sinks.writers as writers_mod
    import flask_data_pipes_spark.sources.files as files_mod

    monkeypatch.setattr(files_mod, "read_jdbc", fake_read)
    monkeypatch.setattr(writers_mod, "write_jdbc", fake_write)

    bind = JdbcBind(
        url="jdbc:postgresql://db/wh",
        driver="org.postgresql.Driver",
        user="u",
        options={"fetchsize": "1000"},
    )
    out = bind.read(None, "SELECT 1", partition_column="id", lower_bound=0, upper_bound=10)
    assert out == "df"
    url, query, kw = captured["read"]
    assert (url, query) == ("jdbc:postgresql://db/wh", "SELECT 1")
    assert kw["driver"] == "org.postgresql.Driver"
    assert kw["partition_column"] == "id"
    assert kw["fetchsize"] == "1000"

    bind.write("df", "t", mode="overwrite", batchsize="500")
    url, table, mode, kw = captured["write"]
    assert (url, table, mode) == ("jdbc:postgresql://db/wh", "t", "overwrite")
    assert kw["batchsize"] == "500"
    assert kw["user"] == "u"


# --- HTTPLogin (clients.py:423-448) ----------------------------------------


def test_http_login_validation():
    from flask_data_pipes_spark.sources import http as http_src

    with pytest.raises(KeyError, match="HTTP method must be defined"):
        http_src.HTTPLogin(url="https://x.example")
    with pytest.raises(http_src.MissingSchema):
        http_src.HTTPLogin(method="POST", url="x.example")
    # method aliases accepted (reference kwargs chain)
    assert http_src.HTTPLogin(**{"http-method": "POST"}).method == "POST"
    assert http_src.HTTPLogin(http_method="PUT").method == "PUT"


def test_http_login_runs_on_target_connection():
    """login= callable issues its request through the target connection,
    so server-set session state (cookies) lands on the session every
    later request uses."""
    pytest.importorskip("requests")
    from flask_data_pipes_spark.sources import http as http_src

    calls = []

    class FakeResp:
        def raise_for_status(self):
            pass

    class FakeConn:
        def request(self, method, endpoint, **kw):
            calls.append((method, endpoint, kw))
            return FakeResp()

    login = http_src.HTTPLogin(
        method="POST", endpoint="auth/login", data={"user": "u", "pass": "p"}
    )
    login(FakeConn())
    assert calls == [("POST", "auth/login", {"data": {"user": "u", "pass": "p"}})]
    assert login.response is not None
