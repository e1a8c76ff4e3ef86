"""E2E pipeline tests with canned fixture payloads (SURVEY.md §5.2.3):
ingest → envelope transform → partitioned write → read-back, plus the
reference's edge semantics and continue-on-error isolation."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from aws_data_pipeline_ads_spark.pipeline.envelope import transform_source
from aws_data_pipeline_ads_spark.pipeline.quality import null_report, validate_schema
from aws_data_pipeline_ads_spark.pipeline.runner import run_pipeline
from aws_data_pipeline_ads_spark.sources.http_json import (
    fetch_records,
    normalize_envelope,
    records_to_df,
)
from aws_data_pipeline_ads_spark.sources.registry import (
    PipelineConfig,
    RetryConfig,
    SourceConfig,
    default_config,
)

AS_OF = dt.datetime(2024, 6, 1, 2, 0, 0)

# FIXTURES.md B1-B3 canned payloads, including the edge rows.
PRODUCTS = [
    {"id": 1, "title": "Widget", "price": "9.99", "category": "tools",
     "description": "d" * 250, "image": "http://x/1.png",
     "rating": {"rate": 4.5, "count": 10}},
    {"id": 2, "title": "NoPrice", "category": "tools"},  # missing price/desc/image/rating
]
POSTS = [
    {"userId": 7, "id": 1, "title": "t1", "body": "b" * 300},
    {"id": 2, "title": "t2"},  # missing userId and body
]
USERS_WRAPPED = {
    "results": [
        {"name": {"title": "Ms", "first": "Ada", "last": "Lovelace"},
         "email": "ada@x.io", "phone": "1",
         "location": {"country": "UK", "city": "London"},
         "registered": {"date": "2020-01-01T00:00:00Z", "age": 4}},
        {"email": "anon@x.io"},  # no name key → guard drops customer struct
    ]
}


def fake_http(payloads: dict[str, object], status: int = 200):
    def get(url: str, timeout: float):
        for frag, payload in payloads.items():
            if frag in url:
                return status, json.dumps(payload)
        return 404, ""
    return get


def test_normalize_envelope_precedence():
    assert normalize_envelope([1, 2]) == [1, 2]
    assert normalize_envelope({"results": [1], "data": [2]}) == [1]
    assert normalize_envelope({"data": [2], "products": [3]}) == [2]
    assert normalize_envelope({"products": [3]}) == [3]
    assert normalize_envelope({"id": 9}) == [{"id": 9}]  # wrap-scalar-in-list
    with pytest.raises(ValueError):
        normalize_envelope(42)


def test_fetch_limit_pushdown_and_slice():
    cfg = SourceConfig(name="s", url="http://api/x", default_limit=2, max_records=5)
    seen = {}

    def get(url, timeout):
        seen["url"] = url
        return 200, json.dumps([{"i": i} for i in range(10)])

    recs = fetch_records(cfg, http_get=get)
    assert "limit=2" in seen["url"]  # pushed to source
    assert len(recs) == 2  # post-hoc guard slice


def test_fetch_retry_backoff_then_fail():
    cfg = SourceConfig(
        name="s", url="http://api/x",
        retry=RetryConfig(max_retries=2, retry_delay=1.0, backoff_multiplier=3.0),
    )
    sleeps = []
    with pytest.raises(OSError, match="failed after 2 retries"):
        fetch_records(cfg, http_get=fake_http({}, status=500), sleep=sleeps.append)
    assert sleeps == [1.0, 3.0]  # exponential backoff


def test_hardened_transport_ladder_falls_through():
    """Each failing transport is recorded and the next tries; success
    short-circuits; total failure names every hop."""
    from aws_data_pipeline_ads_spark.sources.http_json import hardened_http_get

    calls = []

    def bad(url, timeout):
        calls.append("bad")
        raise ConnectionError("cert verify failed")

    def good(url, timeout):
        calls.append("good")
        return 200, "[]"

    status, body = hardened_http_get(
        "http://api/x", 5.0, transports=[("t1", bad), ("t2", good)]
    )
    assert (status, body) == (200, "[]") and calls == ["bad", "good"]

    with pytest.raises(OSError, match=r"t1: ConnectionError.*t2: ConnectionError"):
        hardened_http_get("http://api/x", 5.0,
                          transports=[("t1", bad), ("t2", bad)])


def test_hardened_ladder_gates_noverify_behind_opt_in(monkeypatch, caplog):
    """The insecure CERT_NONE hop is absent by default (a verifying
    transport failing is exactly what an active MITM produces — falling
    back silently would poison the ingest path) and appears dead last
    only with the explicit opt-in; when it serves a response, a WARNING
    names the URL so callers can quarantine the records."""
    import logging

    from aws_data_pipeline_ads_spark.sources import http_json

    monkeypatch.delenv("ADSPARK_ALLOW_INSECURE_TLS", raising=False)
    default = http_json.default_transport_ladder()
    assert default[0][0] == "urllib"
    assert all(name != "urllib-noverify" for name, _ in default)

    opted = http_json.default_transport_ladder(allow_insecure=True)
    assert opted[-1][0] == "urllib-noverify"

    monkeypatch.setenv("ADSPARK_ALLOW_INSECURE_TLS", "1")
    assert http_json.default_transport_ladder()[-1][0] == "urllib-noverify"
    monkeypatch.delenv("ADSPARK_ALLOW_INSECURE_TLS")

    def bad(url, timeout):
        raise ConnectionError("cert verify failed")

    def fake_noverify(url, timeout):
        return 200, "[]"

    with caplog.at_level(logging.WARNING):
        status, _ = http_json.hardened_http_get(
            "https://api/x", 5.0,
            transports=[("urllib", bad), ("urllib-noverify", fake_noverify)],
        )
    assert status == 200
    assert any("INSECURE FETCH" in r.message and "https://api/x" in r.message
               for r in caplog.records)


def test_marketing_transform_edges(spark):
    df = records_to_df(spark, PRODUCTS)
    out = transform_source(df, "marketing", AS_OF)
    rows = {r.product.id: r for r in out.collect()}
    assert rows[1].product.price == 9.99  # string → double cast
    assert len(rows[1].product.description) == 200  # [:200]
    assert rows[2].product.price == 0.0  # missing → default 0
    assert rows[2].product.description == ""  # missing → ''
    assert rows[1].source == "marketing"
    assert len(rows[1].record_id) == 12
    assert str(rows[1].extracted_date) == "2024-06-01"


def test_sales_transform_rename(spark):
    df = records_to_df(spark, POSTS)
    out = transform_source(df, "sales", AS_OF)
    rows = {r.sale.id: r for r in out.collect()}
    assert rows[1].sale.user_id == 7  # userId → user_id
    assert len(rows[1].sale.body) == 200
    assert rows[2].sale.user_id is None  # missing userId → null


def test_crm_guard_on_name(spark):
    df = records_to_df(spark, normalize_envelope(USERS_WRAPPED))
    out = transform_source(df, "crm", AS_OF)
    rows = sorted(out.collect(), key=lambda r: r.customer is None)
    assert rows[0].customer.full_name == "Ada Lovelace"
    assert rows[0].customer.country == "UK"
    assert rows[1].customer is None  # no name → NULL struct, row kept


def test_run_pipeline_e2e_with_partition_layout(spark, tmp_path):
    base = str(tmp_path / "lake")
    http = fake_http({"fakestoreapi": PRODUCTS, "jsonplaceholder": POSTS,
                      "randomuser": USERS_WRAPPED})
    run = run_pipeline(spark, default_config(), base, as_of=AS_OF, http_get=http)
    assert run.errors == []
    assert run.total_records == 6

    back = spark.read.parquet(f"{base}/data")
    assert back.count() == 6
    # Hive partition layout source=/extracted_date= must prune correctly
    one = back.filter("source = 'marketing' AND extracted_date = DATE '2024-06-01'")
    assert one.count() == 2

    from aws_data_pipeline_ads_spark.pipeline.sink import read_run_summaries
    summaries = read_run_summaries(spark, f"{base}/metadata/executions", AS_OF.date())
    s = summaries.collect()[0]
    assert s.sources_processed == 3 and s.total_records == 6 and s.n_errors == 0


def test_run_pipeline_continue_on_error(spark, tmp_path):
    base = str(tmp_path / "lake2")
    cfg = default_config()
    # marketing 500s; sales/crm succeed — run must continue and summarize
    http = fake_http({"jsonplaceholder": POSTS, "randomuser": USERS_WRAPPED})
    fast = PipelineConfig(sources={
        name: SourceConfig(name=sc.name, url=sc.url, limit_param=sc.limit_param,
                           default_limit=sc.default_limit, max_records=sc.max_records,
                           retry=RetryConfig(max_retries=0, retry_delay=0.0))
        for name, sc in cfg.sources.items()
    })
    run = run_pipeline(spark, fast, base, as_of=AS_OF, http_get=http)
    assert len(run.errors) == 1 and "marketing" in run.errors[0]
    assert run.total_records == 4  # sales + crm still landed
    s = spark.read.parquet(f"{base}/metadata/executions").collect()[0]
    assert s.sources_processed == 2 and s.n_errors == 1


def test_null_report_single_pass(spark):
    df = spark.createDataFrame([(1, None), (None, None)], "a int, b string")
    rep = {r.column: (r.n_null, r.n_total) for r in null_report(df).collect()}
    assert rep == {"a": (1, 2), "b": (2, 2)}


def test_validate_schema_reports(spark):
    from pyspark.sql import Row, types as T

    df = spark.createDataFrame([Row(a=1, b="x")])
    expected = T.StructType([
        T.StructField("a", T.StringType()),  # mismatch (actual long)
        T.StructField("c", T.DoubleType()),  # missing
    ])
    issues = {(i.field, i.problem) for i in validate_schema(df, expected)}
    assert issues == {("a", "type_mismatch"), ("c", "missing")}


def test_permissive_json_quarantines_bad_rows(spark, tmp_path):
    from pyspark.sql import types as T

    from aws_data_pipeline_ads_spark.sources import files

    p = tmp_path / "landed.jsonl"
    p.write_text(
        '{"id": 1, "price": 9.5}\n'
        'not json at all\n'
        '{"id": 2, "price": "NaNish"}\n'
        '{"id": 3, "price": 1.25}\n'
    )
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("price", T.DoubleType()),
    ])
    df = files.read_json_validated(spark, str(p), schema)
    good, bad = files.split_corrupt(df)
    assert {r.id for r in good.collect()} == {1, 3}
    assert bad.count() == 2  # the non-JSON line and the bad-typed row
    assert "_corrupt_record" not in good.columns


def test_from_json_corrupt_channel(spark):
    from pyspark.sql import Row, types as T

    from aws_data_pipeline_ads_spark.sources import files

    schema = T.StructType([T.StructField("k", T.LongType())])
    df = spark.createDataFrame(
        [Row(src="a", payload='{"k": 7}'), Row(src="b", payload="{broken")]
    )
    out = files.parse_json_validated(df, "payload", schema)
    good, bad = files.split_corrupt(out)
    assert [(r.src, r.k) for r in good.collect()] == [("a", 7)]
    assert bad.count() == 1


def test_manifest_snapshot_lists_written_files(spark, tmp_path):
    import os

    from aws_data_pipeline_ads_spark.pipeline import sink

    df = spark.range(10).selectExpr(
        "CAST(id AS STRING) AS record_id", "'s1' AS source",
        "'2024-01-02' AS extracted_date", "id AS v"
    )
    base = str(tmp_path / "lake")
    sink.write_partitioned(df, f"{base}/data")
    n = sink.write_manifest(spark, f"{base}/data", f"{base}/manifest", "run1")
    assert n > 0
    manifest = sink.read_manifest(spark, f"{base}/manifest", "run1").collect()
    assert len(manifest) == n
    on_disk = {
        os.path.join(r, f)
        for r, _d, fs in os.walk(f"{base}/data")
        for f in fs
        if not f.startswith(("_", "."))
    }
    listed = {r.file.removeprefix("file:") for r in manifest}
    assert listed == on_disk
    assert all(r.n_bytes > 0 for r in manifest)


def test_source_secondary_endpoints():
    cfg = default_config()
    assert cfg.sources["sales"].endpoint_url("comments").endswith("/posts/comments")
    assert cfg.sources["marketing"].endpoint_url("categories").endswith(
        "/products/categories"
    )
    import pytest as _pytest

    with _pytest.raises(KeyError):
        cfg.sources["crm"].endpoint_url("nope")


# Fixture mirroring the reference's remote-secret payload
# (scripts/setup_secrets.py:44-130): same nesting, same field names.
_SECRET_FIXTURE = {
    "version": "1.0.0",
    "data_sources": {
        "marketing": {
            "name": "FakeStore API",
            "url": "https://fakestoreapi.com/products",
            "endpoints": {
                "all_products": "/products",
                "single_product": "/products/{id}",
                "categories": "/products/categories",
                "category_products": "/products/category/{category}",
            },
            "auth_required": False,
            "timeout": 30,
            "max_records": 50,
        },
        "sales": {
            "name": "JSONPlaceholder API",
            "url": "https://jsonplaceholder.typicode.com",
            "endpoints": {"posts": "/posts", "comments": "/comments",
                          "users": "/users"},
            "timeout": 30,
            "max_records": 100,
        },
        "crm": {
            "name": "RandomUser API",
            "url": "https://randomuser.me/api/",
            "parameters": {"results": 50, "seed": "datapipeline"},
            "timeout": 30,
            "max_records": 50,
        },
    },
    "processing_config": {
        "batch_size": 100,
        "error_handling": "continue_on_error",
        "retry_config": {"max_retries": 3, "retry_delay": 5,
                         "backoff_multiplier": 2},
        "data_quality_checks": {"remove_duplicates": True,
                                "validate_schema": True,
                                "check_null_values": False},
    },
    "output_config": {
        "format": "json",
        "compression": None,
        "partition_by": ["source", "date"],
    },
    "monitoring": {"log_level": "INFO", "metrics_enabled": True},
}


def test_load_config_from_secret_parses_reference_schema():
    import json as _json

    from aws_data_pipeline_ads_spark.sources.registry import (
        load_config_from_secret,
    )

    # fetch returns the JSON string form, as a secret store would
    cfg = load_config_from_secret(lambda: _json.dumps(_SECRET_FIXTURE))
    assert set(cfg.sources) == {"marketing", "sales", "crm"}
    mkt = cfg.sources["marketing"]
    assert mkt.url == "https://fakestoreapi.com/products"
    assert mkt.max_records == 50 and mkt.timeout == 30.0
    # templated endpoints are skipped; plain ones survive
    assert dict(mkt.endpoints) == {
        "all_products": "/products", "categories": "/products/categories",
    }
    assert mkt.retry.max_retries == 3
    assert mkt.retry.retry_delay == 5.0
    assert mkt.retry.backoff_multiplier == 2.0
    assert cfg.processing.batch_size == 100
    assert cfg.processing.error_handling == "continue"
    assert cfg.processing.check_null_values is False
    assert cfg.output.fmt == "json"
    assert cfg.output.compression is None
    assert cfg.output.partition_by == ("source", "date")


def test_load_config_from_secret_falls_back_on_failure():
    from aws_data_pipeline_ads_spark.sources.registry import (
        load_config_from_secret,
    )

    def boom():
        raise ConnectionError("secret store unreachable")

    cfg = load_config_from_secret(boom)
    assert set(cfg.sources) == {"marketing", "sales", "crm"}  # default_config
    assert cfg.sources["sales"].limit_param == "_limit"

    # malformed payloads also fall back instead of failing the pipeline
    cfg2 = load_config_from_secret(lambda: "{not json")
    assert set(cfg2.sources) == {"marketing", "sales", "crm"}


def test_enforce_constraints_flags_rows(spark):
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.pipeline.quality import enforce_constraints

    df = spark.createDataFrame(
        [Row(id=1, price=9.5), Row(id=2, price=-1.0), Row(id=None, price=3.0)]
    )
    out = enforce_constraints(
        df, {"price_pos": "price >= 0", "id_set": "id IS NOT NULL"}
    )
    rows = {
        r.price: (r.chk_price_pos, r.chk_id_set, r["__valid"]) for r in out.collect()
    }
    assert rows[9.5] == (True, True, True)
    assert rows[-1.0] == (False, True, False)
    assert rows[3.0] == (True, False, False)


def test_observe_load_null_id_metric(spark):
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.pipeline.metrics import observe_load

    df = spark.createDataFrame(
        [Row(record_id="a", v=1), Row(record_id=None, v=2), Row(record_id="c", v=3)]
    )
    observed, obs = observe_load(df)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_records"] == 3 and got["n_null_ids"] == 1


def test_write_partitioned_all_formats_round_trip(spark, tmp_path):
    """The sink's fmt knob covers every batch format the lake needs:
    parquet, orc, json, csv all round-trip the same partitioned rows."""
    from pyspark.sql import Row

    from aws_data_pipeline_ads_spark.pipeline.sink import write_partitioned
    from aws_data_pipeline_ads_spark.sources.registry import OutputConfig

    df = spark.createDataFrame([
        Row(source="s1", extracted_date="2024-01-01", k=1, v="a"),
        Row(source="s1", extracted_date="2024-01-02", k=2, v="b"),
        Row(source="s2", extracted_date="2024-01-01", k=3, v="c"),
    ])
    compression = {"parquet": "snappy", "orc": "snappy", "json": None, "csv": None}
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / fmt)
        write_partitioned(
            df, path,
            OutputConfig(fmt=fmt, compression=compression[fmt]),
            mode="overwrite",
        )
        reader = spark.read.format(fmt)
        if fmt == "csv":
            reader = reader.option("header", True).option("inferSchema", True)
        if fmt == "json":
            reader = reader.option("primitivesAsString", False)
        back = reader.load(path)
        # partition-column inference reads extracted_date back as DATE
        got = {(r.source, str(r.extracted_date), int(r.k), r.v)
               for r in back.collect()}
        assert got == {("s1", "2024-01-01", 1, "a"),
                       ("s1", "2024-01-02", 2, "b"),
                       ("s2", "2024-01-01", 3, "c")}, fmt


def test_csv_validated_quarantines_bad_rows(spark, tmp_path):
    """CSV landing: uncastable values quarantine per-row, good rows keep
    flowing — same contract as the PERMISSIVE JSON channel."""
    from pyspark.sql import types as T

    from aws_data_pipeline_ads_spark.sources import files

    p = tmp_path / "in.csv"
    p.write_text(
        "id,price,name\n"
        "1,3.5,widget\n"
        "2,not_a_number,gizmo\n"   # uncastable price → quarantined
        "3,7.25,bolt\n"
    )
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("name", T.StringType()),
    ])
    df = files.read_csv_validated(spark, str(p), schema)
    good, bad = files.split_corrupt(df)
    assert sorted((r.id, r.price, r.name) for r in good.collect()) == [
        (1, 3.5, "widget"), (3, 7.25, "bolt")
    ]
    quarantined = [r[files.CORRUPT_COL] for r in bad.collect()]
    assert quarantined == ["2,not_a_number,gizmo"]
    df.unpersist()
