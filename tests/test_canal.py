"""Unit tests for the Canal envelope operators (SURVEY.md §5.1)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from flink_etl_spark.operators import canal


def _raw(spark, records):
    return spark.createDataFrame([(json.dumps(r) if isinstance(r, dict) else r,) for r in records], ["value"])


def _rec(id=1, es=1704067200000, ts=2, type="INSERT", data=None, isDdl="false", **kw):
    r = {"isDdl": isDdl, "id": id, "es": es, "ts": ts, "type": type,
         "data": [{"city": "sh", "province": "x"}] if data is None else data}
    r.update(kw)
    return r


def test_ddl_filter_drops_ddl_and_malformed(spark):
    raw = _raw(spark, [_rec(id=1), _rec(id=2, isDdl="true"), "not json", _rec(id=3, isDdl=True)])
    out = canal.filter_ddl(canal.parse_canal(raw))
    # boolean True coerces to string "true" and is dropped too
    assert sorted(r.id for r in out.collect()) == [1]


def test_boolean_false_isddl_kept(spark):
    raw = _raw(spark, [_rec(id=5, isDdl=False)])
    assert canal.filter_ddl(canal.parse_canal(raw)).count() == 1


def test_prefilter_ddl_is_negative_only(spark):
    """The raw-string fast path drops only POSITIVELY identified DDL;
    everything it cannot classify flows through to the exact filter —
    pipelines with and without the prefilter must agree exactly."""
    compact = lambda r: json.dumps(r, separators=(",", ":"))  # noqa: E731
    records = [
        _rec(id=1),                          # DML, string "false"
        compact(_rec(id=2, isDdl="true")),   # DDL, compact (Canal/to_json form) -> pre-dropped
        compact(_rec(id=3, isDdl=True)),     # DDL, compact boolean -> pre-dropped
        _rec(id=4, isDdl=False),             # DML, boolean
        # DML whose PAYLOAD embeds the DDL marker as a string value —
        # JSON escapes the inner quotes, so the substring must NOT match
        compact(_rec(id=5, data=[{"city": '{"isDdl":true}'}])),
        "not json",                          # malformed -> exact filter drops
        # spaced serialization: unclassifiable by substring, dropped exactly
        '{"isDdl": "true", "id": 6, "es": 1, "ts": 1, "type": "X", "data": [{}]}',
        # KEY-COLLISION: source table has a column literally named isDdl
        # holding 'true' — serialized UNESCAPED as a key/value inside
        # data[]. The row carries both markers (top-level false + payload
        # true); the prefilter must let it through to the exact filter.
        compact(_rec(id=7, data=[{"isDdl": "true", "city": "bj"}])),
    ]
    raw = _raw(spark, records)
    pre = canal.prefilter_ddl(raw)
    kept_exact = canal.filter_ddl(canal.parse_canal(raw))
    kept_fast = canal.filter_ddl(canal.parse_canal(pre))
    assert sorted(r.id for r in kept_fast.collect()) == [1, 4, 5, 7]
    assert sorted(r.id for r in kept_exact.collect()) == sorted(
        r.id for r in kept_fast.collect()
    )
    # the prefilter really did short-circuit the two classifiable DDLs
    assert pre.count() == len(records) - 2


def test_explode_empty_null_and_multi(spark):
    raw = _raw(spark, [
        _rec(id=1, data=[]),
        _rec(id=2, data=[None]),
        _rec(id=3, data=[{"city": "a", "province": "p"}, {"city": "b", "province": "q"}]),
    ])
    rows = canal.explode_rows(canal.filter_ddl(canal.parse_canal(raw))).collect()
    assert sorted((r.id, r.row["city"]) for r in rows) == [(3, "a"), (3, "b")]


def test_flatten_preserves_registered_column_order(spark):
    raw = _raw(spark, [_rec(id=1, data=[{"city": "sh", "province": "x", "extra": "z"}])])
    flat = canal.flatten(
        canal.explode_rows(canal.filter_ddl(canal.parse_canal(raw))),
        payload_cols=["province", "city"],
    )
    assert flat.columns == ["id", "es", "ts", "type", "province", "city"]
    row = flat.first()
    assert (row.province, row.city) == ("x", "sh")


def test_flatten_csv_layout(spark):
    raw = _raw(spark, [_rec(id=7, es=5, ts=6, type="UPDATE")])
    line = canal.flatten_csv(
        canal.explode_rows(canal.filter_ddl(canal.parse_canal(raw))),
        payload_cols=["city", "province"],
    ).first().line
    assert line == "7,5,6,UPDATE,sh,x"


def test_dt_fallback_on_missing_and_bad_es(spark):
    raw = _raw(spark, [
        _rec(id=1, es=1704067200000),          # 2024-01-01 UTC
        json.dumps({"isDdl": "false", "id": 2, "ts": 1, "type": "INSERT",
                    "data": [{"city": "a", "province": "b"}]}),  # missing es
    ])
    out = canal.ingest_pipeline(raw, ["city", "province"])
    got = {r.id: r.dt for r in out.collect()}
    assert got == {1: "20240101", 2: canal.DT_FALLBACK}


def test_missing_payload_key_yields_null(spark):
    raw = _raw(spark, [_rec(id=1, data=[{"city": "only"}])])
    out = canal.ingest_pipeline(raw, ["city", "province"])
    row = out.first()
    assert row.city == "only" and row.province is None


def test_pipeline_runs_under_streaming(spark, tmp_path):
    """Same transform chain must be streaming-legal (no batch-only ops)."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join(json.dumps(_rec(id=i, es=1704067200000 + i)) for i in range(5)))
    raw = spark.readStream.format("text").schema("value string").load(str(src))
    out = canal.ingest_pipeline(raw, ["city", "province"])
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("canal_stream_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = spark.sql("SELECT count(*) AS n FROM canal_stream_test").first().n
    assert got == 5


def test_flatten_csv_dynamic_preserves_source_order(spark):
    """Unknown-table faithful mode: payload columns come out in SOURCE
    JSON key order (fastjson OrderedField parity), per row."""
    from flink_etl_spark.operators.canal import (
        explode_rows, filter_ddl, flatten_csv_dynamic, parse_canal,
    )

    recs = [
        '{"isDdl":"false","id":1,"es":10,"ts":1,"type":"INSERT",'
        '"data":[{"zeta":"z1","alpha":"a1"}]}',
        '{"isDdl":"false","id":2,"es":20,"ts":2,"type":"UPDATE",'
        '"data":[{"alpha":"a2","zeta":"z2","extra":"e2"}]}',
    ]
    raw = spark.createDataFrame([(r,) for r in recs], "value string")
    out = flatten_csv_dynamic(explode_rows(filter_ddl(parse_canal(raw))))
    lines = sorted(r.line for r in out.collect())
    assert lines == [
        "1,10,1,INSERT,z1,a1",        # zeta first, as in the source JSON
        "2,20,2,UPDATE,a2,z2,e2",     # alpha first here — per-row order
    ]


def test_flatten_csv_dynamic_key_order_property(spark):
    """PROPERTY (hypothesis): for ANY permutation of payload keys, any
    mix of key sets across rows, and null values anywhere,
    flatten_csv_dynamic emits payload values in each document's OWN key
    order with the null token holding positions.

    This pins the assumption the dynamic faithful mode rests on —
    `from_json` to MAP<STRING,STRING> preserving JSON document key
    order (fastjson OrderedField parity) — so a Spark upgrade that
    silently changed map ordering fails HERE, not in a downstream
    positional consumer."""
    import json as _json

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flink_etl_spark.operators.canal import (
        explode_rows, filter_ddl, flatten_csv_dynamic, parse_canal,
    )

    key_pool = ["alpha", "beta", "gamma", "delta", "zeta", "k1", "k2"]
    value_st = st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x24F
            ),
            max_size=8,
        ),
    )
    payload_st = st.lists(
        st.tuples(st.sampled_from(key_pool), value_st),
        min_size=0,
        max_size=5,
        unique_by=lambda kv: kv[0],
    )
    batch_st = st.lists(payload_st, min_size=1, max_size=6)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(batch_st)
    def check(batch):
        recs, expected = [], []
        for i, payload in enumerate(batch):
            doc = dict(payload)  # python dicts preserve insertion order
            recs.append(
                _json.dumps(
                    {
                        "isDdl": "false", "id": i, "es": 10 + i, "ts": i,
                        "type": "X", "data": [doc],
                    },
                    separators=(",", ":"),
                    ensure_ascii=False,
                )
            )
            base = f"{i},{10 + i},{i},X"
            vals = [("null" if v is None else v) for _, v in payload]
            expected.append(base + ("," + ",".join(vals) if vals else ""))
        raw = spark.createDataFrame([(r,) for r in recs], "value string")
        out = flatten_csv_dynamic(explode_rows(filter_ddl(parse_canal(raw))))
        # id rides first in the line; sort both sides by that
        got = sorted(r.line for r in out.collect())
        assert got == sorted(expected)

    check()


def test_flatten_csv_dynamic_empty_payload_no_trailing_sep(spark):
    from flink_etl_spark.operators.canal import (
        explode_rows, filter_ddl, flatten_csv_dynamic, parse_canal,
    )

    raw = spark.createDataFrame(
        [('{"isDdl":"false","id":9,"es":10,"ts":1,"type":"DELETE","data":[{}]}',)],
        "value string",
    )
    out = flatten_csv_dynamic(explode_rows(filter_ddl(parse_canal(raw))))
    assert [r.line for r in out.collect()] == ["9,10,1,DELETE"]


def test_route_tables_multiplexed_topic(spark):
    """One Canal topic carrying two tables routes into per-table flat
    streams, each with its own payload schema."""
    from flink_etl_spark.operators.canal import route_tables

    recs = [
        '{"isDdl":"false","id":1,"es":1704067200000,"ts":1,"type":"INSERT",'
        '"database":"qfbap_ods","table":"code_city",'
        '"data":[{"city":"ham","province":"p1"}]}',
        '{"isDdl":"false","id":2,"es":1704067200000,"ts":2,"type":"INSERT",'
        '"database":"qfbap_ods","table":"users",'
        '"data":[{"name":"ada","email":"a@x"}]}',
        '{"isDdl":"true","id":3,"es":1704067200000,"ts":3,"type":"CREATE",'
        '"database":"qfbap_ods","table":"code_city","data":null}',
    ]
    raw = spark.createDataFrame([(r,) for r in recs], "value string")
    routed = route_tables(
        raw, {"code_city": ["city", "province"], "users": ["name", "email"]}
    )
    cc = routed["code_city"].collect()
    us = routed["users"].collect()
    assert [(r.id, r.city, r.province, r.dt) for r in cc] == [
        (1, "ham", "p1", "20240101")
    ]
    assert [(r.id, r.name, r.email) for r in us] == [(2, "ada", "a@x")]


def test_audit_ingest_accounts_for_every_record(spark):
    from flink_etl_spark.operators.canal import audit_ingest

    recs = [
        '{"isDdl":"false","id":1,"es":1,"ts":1,"type":"INSERT","data":[{"a":"1"},{"a":"2"}]}',
        '{"isDdl":"true","id":2,"es":2,"ts":2,"type":"CREATE","data":null}',
        "not json at all",
        '{"isDdl":"false","id":3,"es":3,"ts":3,"type":"DELETE","data":[{"a":"3"}]}',
    ]
    raw = spark.createDataFrame([(r,) for r in recs], "value string")
    row = audit_ingest(raw).first()
    assert row.n_records == 4
    assert row.n_parsed == 3
    assert row.n_malformed == 1
    assert row.n_ddl == 1
    assert row.n_payload_rows == 3  # 2 + 1 from the two DML records


def test_dt_from_line_matches_typed_dt(spark):
    """Faithful-mode round trip: deriving dt by splitting the CSV line
    (EventTimeBucketAssigner.java:40) equals the typed derivation, and
    unparseable es falls back to 00000000."""
    import pyspark.sql.functions as F

    from flink_etl_spark.operators.canal import dt_from_line

    lines = spark.createDataFrame(
        [("1,1704067200000,7,INSERT,x",), ("2,notanumber,8,INSERT,y",)],
        "line string",
    )
    out = lines.select(dt_from_line("line").alias("dt")).collect()
    assert [r.dt for r in out] == ["20240101", "00000000"]


def test_flatten_typed_payload_casting(spark):
    from flink_etl_spark.operators.canal import (
        explode_rows, filter_ddl, flatten, parse_canal,
    )

    recs = [
        '{"isDdl":"false","id":1,"es":10,"ts":1,"type":"INSERT",'
        '"data":[{"city":"ham","population":"1841000","area_km2":"755.2"}]}',
        '{"isDdl":"false","id":2,"es":20,"ts":2,"type":"INSERT",'
        '"data":[{"city":"muc","population":"notanumber","area_km2":"310.7"}]}',
    ]
    raw = spark.createDataFrame([(r,) for r in recs], "value string")
    out = flatten(
        explode_rows(filter_ddl(parse_canal(raw))),
        ["city", "population", "area_km2"],
        payload_types={"population": "long", "area_km2": "double"},
    )
    assert dict(out.dtypes)["population"] == "bigint"
    assert dict(out.dtypes)["area_km2"] == "double"
    rows = {r.id: r for r in out.collect()}
    assert rows[1].population == 1841000 and abs(rows[1].area_km2 - 755.2) < 1e-9
    assert rows[2].population is None  # malformed -> null, not a crash


def test_route_tables_under_streaming(spark, tmp_path):
    """Multi-table routing works identically under readStream: each
    routed table drains to its own sink."""
    recs = [
        '{"isDdl":"false","id":1,"es":1704067200000,"ts":1,"type":"INSERT",'
        '"table":"code_city","data":[{"city":"ham","province":"p1"}]}',
        '{"isDdl":"false","id":2,"es":1704067200000,"ts":2,"type":"INSERT",'
        '"table":"users","data":[{"name":"ada","email":"a@x"}]}',
    ]
    src = tmp_path / "multi"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join(recs))

    from flink_etl_spark.operators.canal import route_tables

    raw = spark.readStream.format("text").schema("value string").load(str(src))
    routed = route_tables(
        raw, {"code_city": ["city", "province"], "users": ["name", "email"]}
    )
    for tbl, df in routed.items():
        q = (
            df.writeStream.format("parquet")
            .option("path", str(tmp_path / f"out_{tbl}"))
            .option("checkpointLocation", str(tmp_path / f"chk_{tbl}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    cc = spark.read.parquet(str(tmp_path / "out_code_city")).collect()
    us = spark.read.parquet(str(tmp_path / "out_users")).collect()
    assert [(r.id, r.city) for r in cc] == [(1, "ham")]
    assert [(r.id, r.name) for r in us] == [(2, "ada")]


def test_flatten_csv_null_fields_keep_positions(spark):
    """A null payload value (or null envelope field) must emit the
    literal 'null' token, not vanish — concat_ws drops nulls, which
    would shift every later field left and break positional consumers
    (reference parity: Java StringBuilder.append(null) writes "null")."""
    raw = _raw(spark, [
        json.dumps({"isDdl": "false", "id": 7, "ts": 6, "type": "UPDATE",
                    "data": [{"city": None, "province": "x"}]}),  # no es
    ])
    flat = canal.explode_rows(canal.filter_ddl(canal.parse_canal(raw)))
    line = canal.flatten_csv(flat, payload_cols=["city", "province"]).first().line
    assert line == "7,null,6,UPDATE,null,x"
    # positional dt recovery still sees field [1]
    assert line.split(",")[1] == "null"
    dyn = canal.flatten_csv_dynamic(flat).first().line
    assert dyn == "7,null,6,UPDATE,null,x"


def test_dt_parsers_survive_malformed_input_under_ansi(spark):
    """ANSI mode (default in Spark 4) makes getItem/cast THROW on
    malformed input; both dt derivations must instead emit the
    reference's 00000000 sentinel (EventTimeBucketAssigner catches the
    parse failure)."""
    from flink_etl_spark.operators.canal import dt_expr, dt_from_line

    lines = spark.createDataFrame(
        [("no-separator-here",), ("1,notanumber,x",), ("2,1584950400000,y",)],
        ["line"],
    )
    got = [r[0] for r in lines.select(dt_from_line("line")).collect()]
    assert got == ["00000000", "00000000", "20200323"]

    vals = spark.createDataFrame([("abc",), ("1584950400000",)], ["es"])
    got2 = [r[0] for r in vals.select(dt_expr("es")).collect()]
    assert got2 == ["00000000", "20200323"]
