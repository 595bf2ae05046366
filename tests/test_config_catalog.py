"""Config, catalog introspection, and UC-client tests (mock transport)."""

from __future__ import annotations

import pytest

from delta_unity_duckdb_spark.config import Config, load_dotenv
from delta_unity_duckdb_spark.sources.catalog import (
    describe,
    list_tables,
    table_stats,
)
from delta_unity_duckdb_spark.sources.uc_client import UnityCatalogClient


def test_config_env_and_hostname_map():
    cfg = Config(
        env={
            "DATABRICKS_HOST": "https://example.cloud.databricks.com",
            "DATABRICKS_TOKEN": "tok-123",
            "PG_HOSTNAME_MAP": '{"inst1": "host1.example.com"}',
        },
        dotenv_path=None,
    )
    assert cfg.get_pg_hostname("inst1") == "host1.example.com"
    assert cfg.get_pg_hostname("other") == "other"  # fallback (config.py:40-45)
    d = cfg.to_dict()
    assert d["databricks_token"] == "***REDACTED***"
    assert cfg.to_dict(redact=False)["databricks_token"] == "tok-123"


def test_config_validation():
    cfg = Config(env={}, dotenv_path=None, required=("DATABRICKS_HOST",))
    assert cfg.validate() == ["DATABRICKS_HOST"]
    cfg2 = Config(env={"DATABRICKS_HOST": "h"}, dotenv_path=None, required=("DATABRICKS_HOST",))
    assert cfg2.validate() == []


def test_dotenv_loader(tmp_path, monkeypatch):
    monkeypatch.delenv("DUDS_TEST_KEY", raising=False)
    p = tmp_path / ".env"
    p.write_text("# comment\nDUDS_TEST_KEY='v1'\n\nBAD LINE\n")
    loaded = load_dotenv(str(p))
    assert loaded == {"DUDS_TEST_KEY": "v1"}


def test_list_tables_and_describe(spark, sf_dir):
    tables = {t["table_name"] for t in list_tables(spark, sf_dir)}
    assert {"region", "nation", "lineitem", "documents", "embeddings"} <= tables
    cols = describe(spark, sf_dir, "region")
    assert cols[0]["ordinal_position"] == 1
    assert {"r_regionkey", "r_name"} <= {c["column_name"] for c in cols}
    assert table_stats(spark, sf_dir, "region") == {"count": 5}


class FakeTransport:
    """Records calls; returns canned UC REST responses (js:132-191 shapes)."""

    def __init__(self):
        self.calls = []
        self.table_info = {
            "table_id": "tid-1",
            "storage_location": "abfss://cont@acct1.dfs.core.windows.net/tables/t1",
        }
        self.creds = {
            "azure_user_delegation_sas": {"sas_token": "sig=abc"},
            "expiration_time": (2**33) * 1000,  # far future
        }

    def __call__(self, method, url, headers, body):
        self.calls.append((method, url))
        assert headers["Authorization"] == "Bearer tok"
        if "/tables/" in url:
            return dict(self.table_info)
        return dict(self.creds)


def test_uc_resolve_and_cache():
    t = FakeTransport()
    c = UnityCatalogClient("https://h", "tok", transport=t)
    info, creds = c.resolve("cat.sch.tbl")
    assert info["table_id"] == "tid-1"
    assert creds["azure_user_delegation_sas"]["sas_token"] == "sig=abc"
    assert len(t.calls) == 2
    c.resolve("cat.sch.tbl")  # cached — no new REST calls (SURVEY §4 fix)
    assert len(t.calls) == 2


def test_uc_rejects_bad_name():
    c = UnityCatalogClient("https://h", "tok", transport=FakeTransport())
    with pytest.raises(ValueError):
        c.get_table_info("not_three_part")


def test_uc_storage_account_parse():
    assert (
        UnityCatalogClient.storage_account_of(
            "abfss://c@myacct.dfs.core.windows.net/x"
        )
        == "myacct"
    )
    assert UnityCatalogClient.storage_account_of("s3://bucket/x") is None


def test_uc_spark_credential_injection(spark):
    t = FakeTransport()
    c = UnityCatalogClient("https://h", "tok", transport=t)
    location = c.configure_spark_credentials(spark, "cat.sch.tbl")
    assert location.startswith("abfss://")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    suffix = "acct1.dfs.core.windows.net"
    assert hconf.get(f"fs.azure.account.auth.type.{suffix}") == "SAS"
    assert hconf.get(f"fs.azure.sas.fixed.token.{suffix}") == "sig=abc"
