"""Unit tests for the C1 token-refresh control plane and S4 retry
classification (reference main.py:97-155, 226-237, 326-340)."""

from __future__ import annotations

import pytest

from fb_ads_bigquery_etl_spark.sources.fb_source import (
    FakeTokenService,
    FbPage,
    GraphApiError,
    InMemorySecretStore,
    RefreshingTokenProvider,
    Transport,
    _retrying_pages,
)

DAY = 86400
NOW = 1_700_000_000


def _provider(expires_at: int, **kw):
    store = InMemorySecretStore({"fb-ads-token": "tok0"})
    service = FakeTokenService({"tok0": expires_at})
    prov = RefreshingTokenProvider(store, service, now_fn=lambda: NOW, **kw)
    return prov, store, service


class TestRefreshingTokenProvider:
    def test_no_refresh_when_fresh(self):
        prov, store, service = _provider(NOW + 30 * DAY)
        assert prov.get_token() == "tok0"
        assert service.exchanges == 0
        assert store.writes == []

    def test_refresh_when_within_window(self):
        prov, store, service = _provider(NOW + 5 * DAY)
        fresh = prov.get_token()
        assert fresh != "tok0"
        assert service.exchanges == 1
        # write-back (main.py:226-237): the store holds the fresh token
        assert store.writes == [("fb-ads-token", fresh)]
        assert store.get_secret("fb-ads-token") == fresh

    def test_refresh_at_exact_boundary(self):
        # expires in exactly 7 days -> counts as "within window" -> refresh
        prov, _, service = _provider(NOW + 7 * DAY)
        prov.get_token()
        assert service.exchanges == 1

    def test_no_refresh_just_outside_boundary(self):
        prov, _, service = _provider(NOW + 7 * DAY + 1)
        assert prov.get_token() == "tok0"
        assert service.exchanges == 0

    def test_never_expiring_token_used_as_is(self):
        prov, store, service = _provider(0)
        assert prov.get_token() == "tok0"
        assert service.exchanges == 0
        assert store.writes == []

    def test_refreshed_token_is_fresh_next_run(self):
        prov, store, service = _provider(NOW + 1 * DAY)
        fresh = prov.get_token()
        # next run reads the written-back token, now 61 days out: no refresh
        assert prov.get_token() == fresh
        assert service.exchanges == 1

    def test_invalid_token_surfaces_auth_error(self):
        store = InMemorySecretStore({"fb-ads-token": "revoked"})
        prov = RefreshingTokenProvider(
            store, FakeTokenService({}), now_fn=lambda: NOW
        )
        with pytest.raises(GraphApiError) as ei:
            prov.get_token()
        assert ei.value.is_fatal_auth

    # Transient exchange failures inside the refresh window fall back to
    # the still-valid current token (reference main.py get_valid_token)
    # instead of failing the whole daily run.

    def test_transient_refresh_failure_falls_back_to_valid_token(self):
        store = InMemorySecretStore({"fb-ads-token": "tok0"})
        service = _FailingExchangeService(
            {"tok0": NOW + 5 * DAY}, IOError("graph outage")
        )
        prov = RefreshingTokenProvider(store, service, now_fn=lambda: NOW)
        assert prov.get_token() == "tok0"  # 5 days of validity left
        assert service.exchanges == 1  # refresh WAS attempted
        assert store.writes == []  # nothing written back

    def test_transient_refresh_failure_with_expired_token_raises(self):
        service = _FailingExchangeService({"tok0": NOW - 1}, IOError("outage"))
        prov = RefreshingTokenProvider(
            InMemorySecretStore({"fb-ads-token": "tok0"}), service,
            now_fn=lambda: NOW,
        )
        with pytest.raises(IOError):
            prov.get_token()

    def test_fatal_refresh_failure_raises_even_if_token_valid(self):
        service = _FailingExchangeService(
            {"tok0": NOW + 5 * DAY},
            GraphApiError("revoked", status=401, fb_code=190),
        )
        prov = RefreshingTokenProvider(
            InMemorySecretStore({"fb-ads-token": "tok0"}), service,
            now_fn=lambda: NOW,
        )
        with pytest.raises(GraphApiError):
            prov.get_token()


class _FailingExchangeService(FakeTokenService):
    def __init__(self, expiries, exc):
        super().__init__(expiries)
        self._exc = exc

    def exchange_token(self, token):
        self.exchanges += 1
        raise self._exc


class _CountingTransport(Transport):
    def __init__(self, failures: list[Exception]):
        self.failures = list(failures)
        self.calls = 0

    def fetch_page(self, token, account_id, day, fields, cursor):
        self.calls += 1
        if self.failures:
            raise self.failures.pop(0)
        return FbPage([{"ad_name": "a"}], None)


class TestRetryClassification:
    def test_fatal_auth_error_fails_after_one_attempt(self):
        t = _CountingTransport(
            [GraphApiError("expired", status=401, fb_code=190)] * 3
        )
        with pytest.raises(GraphApiError):
            list(_retrying_pages(t, "tok", "acct", "2024-01-01", []))
        assert t.calls == 1

    @pytest.mark.parametrize("status,fb_code", [(403, None), (None, 104)])
    def test_fatal_classification_variants(self, status, fb_code):
        t = _CountingTransport(
            [GraphApiError("auth", status=status, fb_code=fb_code)] * 3
        )
        with pytest.raises(GraphApiError):
            list(_retrying_pages(t, "tok", "acct", "2024-01-01", []))
        assert t.calls == 1

    def test_transient_error_retried_to_success(self):
        t = _CountingTransport([IOError("flaky"), IOError("flaky")])
        rows = list(_retrying_pages(t, "tok", "acct", "2024-01-01", []))
        assert rows == [{"ad_name": "a"}]
        assert t.calls == 3

    def test_transient_rate_limit_retried(self):
        # FB 429 / code 17 (rate limit) is transient, not auth-fatal
        t = _CountingTransport([GraphApiError("rate", status=429, fb_code=17)])
        rows = list(_retrying_pages(t, "tok", "acct", "2024-01-01", []))
        assert rows == [{"ad_name": "a"}]
        assert t.calls == 2

    def test_transient_exhaustion_raises_after_max_retries(self):
        t = _CountingTransport([IOError("down")] * 5)
        with pytest.raises(IOError):
            list(_retrying_pages(t, "tok", "acct", "2024-01-01", []))
        assert t.calls == 3


def test_streaming_source_drains_range_equal_to_batch(spark):
    """The fb_insights STREAMING source (SimpleDataSourceStreamReader)
    under Trigger.AvailableNow must ingest exactly the batch reader's
    rows for the same (accounts x date-range) — checkpointed offsets +
    deterministic per-day replay give exactly-once."""
    from fb_ads_bigquery_etl_spark.sources.fb_source import register

    register(spark)
    opts = dict(
        accounts="acct_a,acct_b",
        start_date="2026-01-10",
        end_date="2026-01-12",
        transport="fake",
    )
    key = ["account_id", "campaign_name", "ad_name", "date_start",
           "publisher_platform"]
    batch = spark.read.format("fb_insights").options(**opts).load()
    stream = spark.readStream.format("fb_insights").options(**opts).load()
    q = (
        stream.writeStream.format("memory")
        .queryName("t_fbs_drain")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_fbs_drain")
    assert got.count() == batch.count() > 0
    assert {tuple(r) for r in got.select(*key).collect()} == {
        tuple(r) for r in batch.select(*key).collect()
    }

    # day-at-a-time polling: one AvailableNow trigger ingests exactly
    # the one prefetched day (the steady-state daily-poll shape)
    daily = (
        spark.readStream.format("fb_insights")
        .options(max_days_per_batch="1", **opts)
        .load()
    )
    q2 = (
        daily.writeStream.format("memory")
        .queryName("t_fbs_daily")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    one_day = spark.table("t_fbs_daily")
    assert one_day.select("date_start").distinct().count() == 1


def test_streaming_source_fails_fast_on_fetch_error(spark):
    """Streaming must NOT inherit batch error-isolation: a swallowed
    failure would advance the checkpointed offset past an empty
    (account, day) forever. The micro-batch has to FAIL so the trigger
    can retry without committing the offset."""
    from fb_ads_bigquery_etl_spark.sources.fb_source import register

    register(spark)
    opts = dict(
        accounts="acct_a,bad",
        start_date="2026-01-10",
        end_date="2026-01-10",
        transport="fake",
        fail_accounts="bad",
    )
    stream = spark.readStream.format("fb_insights").options(**opts).load()
    q = (
        stream.writeStream.format("memory")
        .queryName("t_fbs_failfast")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    # the explicit opt-in restores batch-style degradation
    iso = (
        spark.readStream.format("fb_insights")
        .options(streaming_error_isolation="true", **opts)
        .load()
    )
    q2 = (
        iso.writeStream.format("memory")
        .queryName("t_fbs_iso")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    got = spark.table("t_fbs_iso")
    assert {r[0] for r in got.select("account_id").distinct().collect()} == {
        "acct_a"
    }


def test_streaming_source_open_ended_polls_one_day(spark):
    """No end_date = an always-on poller: each trigger ingests exactly
    one day and the offset keeps advancing (the batch reader's
    start/end validation must not reject the open-ended stream)."""
    from fb_ads_bigquery_etl_spark.sources.fb_source import register

    register(spark)
    stream = (
        spark.readStream.format("fb_insights")
        .options(
            accounts="acct_a",
            start_date="2026-01-10",
            transport="fake",
            # pin the poller's last-complete-day boundary (defaults to
            # wall-clock yesterday): the offset must clamp here, never
            # advance through not-yet-complete days
            clamp_to="2026-01-10",
        )
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_fbs_open")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_fbs_open")
    assert got.count() > 0
    assert {str(r[0]) for r in got.select("date_start").distinct().collect()} == {
        "2026-01-10"
    }


def test_row_insert_sink_writes_and_rejects(spark, tmp_path):
    """The custom Python DataSink mirrors the reference's streaming
    insert: good rows land atomically with an audit record; a per-row
    error fails the job (main.py:441-447 raise semantics)."""
    import glob
    import json as _json

    from fb_ads_bigquery_etl_spark.sources.insert_sink import register_sink

    register_sink(spark)
    ok = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
    )
    dest = str(tmp_path / "inserted")
    ok.repartition(2).write.format("row_insert").option("path", dest).mode(
        "append"
    ).save()
    rows = []
    for shard in glob.glob(dest + "/part_*.jsonl"):
        rows += [_json.loads(line) for line in open(shard)]
    assert sorted(r["id"] for r in rows) == [1, 2, 3]
    audit = _json.load(open(dest + "/_AUDIT.json"))
    assert audit["rows"] == 3
    assert not glob.glob(dest + "/_tmp_*")  # nothing unpublished

    bad = spark.createDataFrame([(1, "a"), (2, None)], "id long, name string")
    with pytest.raises(Exception, match="insert rejected"):
        (
            bad.write.format("row_insert")
            .option("path", str(tmp_path / "rejected"))
            .option("reject_null_in", "name")
            .mode("append")
            .save()
        )
